"""Child process for the 2-process jax.distributed test (test_multihost.py).

Usage: python multihost_child.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices (8 global), joins the
distributed runtime, builds the global (bands, time) mesh with the placement
policy of parallel/multihost.py -- bands across hosts (DCN), time within a
host (ICI) -- feeds ONLY its local bands, runs the sharded banded scan step,
and verifies its local shard of the output against a single-device
computation of the same bands. Prints MULTIHOST_OK on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
# keep the axon TPU plugin out of a multi-process run
os.environ["TPU_SKIP_MDS_QUERY"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from rtl_sdr_scanner_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs

    # placement policy: time axis never crosses a process boundary
    mesh = multihost.make_global_mesh(n_time_per_host=2)
    grid = mesh.devices
    n_bands = grid.shape[0]
    for b in range(n_bands):
        owners = {d.process_index for d in grid[b, :]}
        assert len(owners) == 1, f"time axis of band {b} spans processes {owners}"

    mine = multihost.local_band_indices(mesh)
    assert mine, "every process must own bands"
    for b in mine:
        assert grid[b, 0].process_index == jax.process_index()

    # disjoint full cover across processes
    from jax.experimental import multihost_utils

    one_hot = np.zeros(n_bands, dtype=np.int32)
    one_hot[mine] = 1
    cover = np.asarray(multihost_utils.process_allgather(one_hot))
    assert (cover.sum(axis=0) == 1).all(), f"bands not disjointly covered: {cover}"

    # sharded banded scan: every process feeds only ITS bands (data-local
    # ingest); globally-seeded data keeps the oracle reproducible per band
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtl_sdr_scanner_tpu.models.scan_pipeline import (
        ScanConfig,
        _scan_block,
        init_scan_state,
    )
    from rtl_sdr_scanner_tpu.parallel.mesh import BANDS_AXIS
    from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
        init_banded_state,
        make_sharded_scan_step,
    )

    cfg = ScanConfig.create(256000, frames_per_block=2)
    group = cfg.fft_size * cfg.decimator_factor
    shard = NamedSharding(mesh, P(BANDS_AXIS))

    def band_iq(b: int) -> np.ndarray:
        rng = np.random.default_rng(100 + b)
        return 0.05 * (
            rng.standard_normal((cfg.frames_per_block, group))
            + 1j * rng.standard_normal((cfg.frames_per_block, group))
        ).astype(np.complex64)

    now_row = (np.arange(1, cfg.frames_per_block + 1) * cfg.frame_interval_ms).astype(
        np.int32
    )

    iq_global = jax.make_array_from_callback(
        (n_bands, cfg.frames_per_block, group),
        shard,
        lambda idx: np.stack(
            [band_iq(b) for b in range(*idx[0].indices(n_bands))]
        )[(slice(None), idx[1], idx[2])],
    )
    now_global = jax.make_array_from_callback(
        (n_bands, cfg.frames_per_block),
        shard,
        lambda idx: np.tile(now_row, (len(range(*idx[0].indices(n_bands))), 1)),
    )

    step = make_sharded_scan_step(cfg, mesh)
    state = init_banded_state(cfg, n_bands, mesh)
    state, outs = step(state, iq_global, now_global)

    # verify this process's shard(s) against the per-band single-device oracle
    import functools

    oracle = jax.jit(functools.partial(_scan_block, cfg))
    checked = 0
    for s in outs.raw.addressable_shards:
        lo = s.index[0].start or 0
        local = np.asarray(s.data)
        for off, b in enumerate(range(lo, lo + local.shape[0])):
            _, o = oracle(init_scan_state(cfg), jnp.asarray(band_iq(b)), jnp.asarray(now_row))
            np.testing.assert_allclose(local[off], np.asarray(o.raw), atol=1e-4)
            checked += 1
    assert checked >= len(mine), (checked, mine)

    print(f"MULTIHOST_OK process={jax.process_index()}/{jax.process_count()} "
          f"bands={mine} checked={checked}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
