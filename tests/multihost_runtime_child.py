"""Child process for the 2-process multi-host RUNTIME test.

Usage: python multihost_runtime_child.py <pid> <nprocs> <port> <config> <out>

Each process contributes 4 virtual CPU devices, joins jax.distributed via the
same env contract runtime/main.py uses (tunables.multihost), then runs the
REAL application scanner (WidebandScanner from the replay config): the bands
mesh spans both processes' devices; this process feeds only its own bands and
publishes only their payloads. The captured (topic, payload) list is pickled
to <out> for the parent to compare against a single-process run.
"""

import os
import pickle
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["TPU_SKIP_MDS_QUERY"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nprocs, port, config_path, out_path = sys.argv[1:6]
    # the runtime/main.py env contract
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nprocs
    os.environ["JAX_PROCESS_ID"] = pid

    from rtl_sdr_scanner_tpu.parallel import multihost

    multihost.initialize()
    assert jax.process_count() == int(nprocs)

    from rtl_sdr_scanner_tpu.runtime.config import Config
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

    cfg = Config.load_from_file(config_path, scan_hardware=False)
    assert cfg.tunables.multihost
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    assert scanner._mesh is not None
    assert scanner._multihost
    assert scanner._mesh.devices.size == 4 * int(nprocs)
    mine = scanner._local_bands
    assert mine and len(mine) < len(scanner.sessions), mine

    scanner.run_to_completion()
    scanner.stop()

    with open(out_path, "wb") as fh:
        pickle.dump({"bands": mine, "published": list(mqtt.published)}, fh)
    print(
        f"MULTIHOST_RUNTIME_OK process={jax.process_index()}/{jax.process_count()} "
        f"bands={mine} payloads={len(mqtt.published)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
