"""Multi-host (DCN) scaling proof: 2 real jax.distributed processes.

BASELINE.md scaling row ("near-linear 1 chip -> 2+ hosts"): parallel/multihost
is validated by actually spawning two processes (4 virtual CPU devices each),
joining a distributed runtime over a localhost coordinator, building the
global (bands, time) mesh with the DCN-bands / ICI-time placement policy,
feeding disjoint band sets from each process, and checking the sharded scan
output against single-device oracles (tests/multihost_child.py).
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_scan():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # children pin CPU themselves
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(CHILD))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(CHILD)),
        )
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:  # kill the exact PIDs we started
            p.kill()
        for p in procs:
            out, _ = p.communicate()
            outputs.append(out)
        pytest.fail("multihost children timed out:\n" + "\n---\n".join(outputs))

    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"child failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
    # both processes owned bands and cross-checked them
    assert "process=0/2" in "".join(outputs)
    assert "process=1/2" in "".join(outputs)


RUNTIME_CHILD = os.path.join(os.path.dirname(__file__), "multihost_runtime_child.py")
RATE = 2_048_000
B = 8
CENTER = 145_000_000


def _band_of(frequency: int) -> int:
    """Sub-band index owning `frequency` (channel cores partition the span)."""
    core = RATE // B
    k = round((frequency - CENTER) / core) % B
    return int(k)


def test_two_process_runtime_payload_parity(tmp_path):
    """Round-2 verdict item 2: the RUNTIME at 2 hosts. Two jax.distributed
    processes run the same replay WidebandScanner config (tunables.multihost
    env contract); each feeds only its local bands and publishes only their
    payloads. Every child's payload stream must equal the single-process
    run's stream filtered to that child's bands, byte for byte."""
    import json
    import pickle

    import numpy as np

    from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
    from rtl_sdr_scanner_tpu.runtime.data_controller import (
        decode_spectrogram,
        decode_transmission,
    )
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

    # capture: one signal in a proc-0 band (+500 kHz -> ch2), one in a
    # proc-1 band (-750 kHz -> ch5) so BOTH processes detect and record
    rng = np.random.default_rng(23)
    secs = 8.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    keyed = (t >= 3.0) & (t < 6.0)
    for f, tone in ((500_000, 800), (-750_000, 1200)):
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * f * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        iq += 0.4 * np.exp(1j * phase) * keyed
    capture = tmp_path / "mh.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(capture)

    raw = default_config_json()
    raw["tunables"] = {"mesh_bands": -1, "multihost": True}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "mh0",
            "driver": "replay",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": CENTER - RATE // 2, "stop": CENTER + RATE // 2}],
            "file": str(capture),
            "file_format": "cf32",
            "channels": B,
        }
    ]
    cfg_path = tmp_path / "mh.json"
    cfg_path.write_text(json.dumps(raw))

    # single-process reference on the parent's 8 virtual devices (same
    # global mesh size the two children build together)
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    ref = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    assert ref._mesh is not None and ref._mesh.devices.size == 8
    ref.run_to_completion()
    ref.stop()
    single = list(mqtt.published)
    assert any(t_.endswith("/transmission/uint8") for t_, _ in single)

    def band_of_payload(topic, payload):
        if topic.endswith("/transmission/uint8"):
            _, s0, s1, _, _ = decode_transmission(payload)
        else:
            _, s0, s1, _, _ = decode_spectrogram(payload)
        return _band_of((s0 + s1) // 2)

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(RUNTIME_CHILD))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    outs = [tmp_path / f"child{i}.pkl" for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                RUNTIME_CHILD,
                str(pid),
                "2",
                str(port),
                str(cfg_path),
                str(outs[pid]),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            logs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for p in procs:
            out, _ = p.communicate()
            logs.append(out)
        pytest.fail("runtime children timed out:\n" + "\n---\n".join(logs))
    for p, out in zip(procs, logs):
        assert p.returncode == 0, f"child failed:\n{out}"
        assert "MULTIHOST_RUNTIME_OK" in out, out

    all_bands = []
    for pid in range(2):
        with open(outs[pid], "rb") as fh:
            child = pickle.load(fh)
        bands = set(child["bands"])
        all_bands.extend(child["bands"])
        # child's stream == the single-process stream filtered to its bands
        expect = [
            (t_, p_) for t_, p_ in single if band_of_payload(t_, p_) in bands
        ]
        got = list(map(tuple, child["published"]))
        assert got, f"child {pid} published nothing"
        assert got == expect, (
            f"child {pid} payloads diverged from single-process run "
            f"({len(got)} vs {len(expect)})"
        )
    # both children together covered every band exactly once
    assert sorted(all_bands) == list(range(B)), all_bands
