#!/usr/bin/env python3
"""Per-stage probes of the wideband MESH program (round-4 verdict #1).

Attributes the app-path vs idealized-fused gap at matched geometry:
- in-mesh channelizer alone (bank matmul + channels materialization)
- banded compact scan alone on pre-split channels
- banded DDC alone
- the fused single-dispatch program (channelize + scan + DDC)
- the idealized fused-vmapped per-band step (bench headline model)

Usage (real chip, BACKGROUND per CLAUDE.md):
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_wideband.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RATE = 20_480_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig, make_tables
    from rtl_sdr_scanner_tpu.models.scan_pipeline import (
        ScanConfig,
        init_spectro_acc,
    )
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        channelize_block_pairs,
        init_channelizer_state,
        plan_channelizer,
    )
    from rtl_sdr_scanner_tpu.parallel.mesh import band_sharding, make_mesh, replicated
    from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
        init_banded_ddc_state,
        init_banded_state,
        make_sharded_banded_ddc,
        make_sharded_wideband_fused_step,
        make_sharded_wideband_step,
    )

    nb, frames = args.bands, args.frames
    cfg = ScanConfig.create(RATE, frames_per_block=frames)
    group = cfg.fft_size * cfg.decimator_factor
    block = cfg.block_samples
    ddc_cfg = DdcConfig.create(RATE, 16000, 2, block)
    group_size = int(np.ceil(16000 / cfg.step_hz))
    plan = plan_channelizer(nb)
    mesh = make_mesh(n_bands=1, n_time=1)

    rng = np.random.default_rng(0)
    n_wide = nb * block
    pairs = jax.device_put(
        rng.integers(-32, 32, size=(n_wide, 2), dtype=np.int8)
    )
    now = ((1 + np.arange(frames)) * cfg.frame_interval_ms).astype(np.int32)
    keys = jnp.asarray(np.full((nb, 16), -1, dtype=np.int32))
    valid = jnp.asarray(np.ones((nb, cfg.fft_size), dtype=bool))
    per_band = [
        make_tables(ddc_cfg, rng.integers(-RATE // 2, RATE // 2, size=2))
        for _ in range(nb)
    ]
    tables = jax.device_put(
        jax.tree.map(lambda *xs: jnp.stack(xs), *per_band), band_sharding(mesh)
    )
    keep_mask = np.ones((nb, 2), dtype=np.float32)

    def timed(label, fn):
        fn()  # compile + sync
        vals = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            vals.append((time.perf_counter() - t0) * 1000)
        med = sorted(vals)[len(vals) // 2]
        print(
            f"{label}: median {med:.1f} ms/block (n={len(vals)}, "
            f"min {min(vals):.1f}, max {max(vals):.1f})",
            flush=True,
        )

    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    x8 = jax.device_put(np.ones(8, np.float32))
    timed("dispatch+fetch floor", lambda: float(np.asarray(tiny(x8))))

    # channelizer alone (the bank matmul + channels materialization)
    chan0 = jax.device_put(init_channelizer_state(plan), replicated(mesh))
    chan_jit = jax.jit(
        lambda cs, x: channelize_block_pairs(plan, cs, x)
    )

    def run_chan():
        cs, channels = chan_jit(chan0, pairs)
        return float(np.asarray(jnp.sum(channels[..., 0][:, ::4096])))

    timed("channelizer only", run_chan)

    # pre-split channels input for the scan-only probe
    _, channels0 = chan_jit(chan0, pairs)
    channels0 = jax.device_put(np.asarray(channels0))

    wide_step = make_sharded_wideband_step(cfg, group_size, 64, mesh, plan, 1, nb)
    ddc_step = make_sharded_banded_ddc(ddc_cfg, mesh, nb)
    fused = make_sharded_wideband_fused_step(
        cfg, ddc_cfg, group_size, 64, mesh, plan, 1, nb
    )

    state = {"v": None}

    def fresh():
        return (
            jax.device_put(init_channelizer_state(plan), replicated(mesh)),
            init_banded_state(cfg, nb, mesh),
            jax.device_put(
                jnp.zeros((nb, cfg.spectro_size), dtype=jnp.float32),
                band_sharding(mesh),
            ),
            init_banded_ddc_state(ddc_cfg, nb, mesh),
        )

    # DDC alone
    state["v"] = fresh()

    def run_ddc():
        cs, ss, acc, ds = state["v"]
        ds, rec = ddc_step(ds, channels0, tables, keep_mask)
        state["v"] = (cs, ss, acc, ds)
        return float(np.asarray(jnp.sum(rec[..., 0][:, :, ::512].astype(jnp.int32))))

    timed("banded DDC only", run_ddc)

    # wide step (channelize + scan, no DDC)
    state["v"] = fresh()

    def run_wide():
        cs, ss, acc, ds = state["v"]
        cs, ss, acc, packed, channels = wide_step(
            cs, ss, acc, pairs, jnp.asarray(now), keys, valid,
            jnp.float32(8.0), jnp.float32(1.0),
        )
        state["v"] = (cs, ss, acc, ds)
        return float(np.asarray(jnp.sum(packed[:, ::64])))

    timed("wide step (channelize+scan)", run_wide)

    # fused single dispatch
    state["v"] = fresh()

    def run_fused():
        cs, ss, acc, ds = state["v"]
        cs, ss, acc, ds, packed, rec, _ = fused(
            cs, ss, acc, ds, pairs, jnp.asarray(now), keys, valid,
            jnp.float32(8.0), jnp.float32(1.0), tables, keep_mask,
        )
        state["v"] = (cs, ss, acc, ds)
        return float(np.asarray(jnp.sum(packed[:, ::64])))

    timed("FUSED (channelize+scan+DDC)", run_fused)
    return 0


if __name__ == "__main__":
    sys.exit(main())
