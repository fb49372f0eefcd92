#!/usr/bin/env python3
"""Per-stage device timing of the benchmark pipeline (BENCH.md methodology).

Each probe jits a PREFIX of the fused scan step (or one DDC piece) that ends
in a scalar reduction, then times dispatch+fetch with np.asarray -- on the
axon tunnel jax.block_until_ready does not synchronize, so fetching a scalar
is the only reliable fence. Subtract the reported calibration floor (a tiny
jit round trip) to compare stages. Stage deltas = consecutive prefix
differences.

Usage: run on the real chip, in background (see .claude/skills/verify):
  python scripts/profile_stages.py [--bands 32] [--frames 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bands", type=int, default=32)
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--rate", type=int, default=20_480_000)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig, fold_banded, make_tables
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import init_state as ddc_init
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import _ddc_block_banded
    from rtl_sdr_scanner_tpu.models.scan_pipeline import ScanConfig, init_scan_state
    from rtl_sdr_scanner_tpu.models.scan_pipeline import _frames_power
    from rtl_sdr_scanner_tpu.ops.averager import averager_block, ordered_history
    from rtl_sdr_scanner_tpu.ops.detect import compact_detection
    from rtl_sdr_scanner_tpu.ops.noise import noise_block
    from rtl_sdr_scanner_tpu.ops.smooth import sliding_average

    nb, frames = args.bands, args.frames
    rate = args.rate
    cfg = ScanConfig.create(rate, frames_per_block=frames)
    group = cfg.fft_size * cfg.decimator_factor
    ddc_cfg = DdcConfig.create(rate, 16000, 2, cfg.block_samples)
    group_size = int(np.ceil(16000 / cfg.step_hz))

    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-32, 32, size=(nb, frames, group, 2), dtype=np.int8))
    now = jnp.broadcast_to(
        jnp.asarray(((1 + np.arange(frames)) * cfg.frame_interval_ms).astype(np.int32)),
        (nb, frames),
    )
    stack = lambda a: jnp.broadcast_to(a, (nb,) + a.shape)
    scan_state = jax.tree.map(stack, init_scan_state(cfg, 0))
    ddc_state = fold_banded(jax.tree.map(stack, ddc_init(ddc_cfg)))
    tables = fold_banded(
        jax.tree.map(stack, make_tables(ddc_cfg, rng.integers(-rate // 2, rate // 2, size=2)))
    )
    keys = jnp.asarray(np.full(16, -1, dtype=np.int32))
    valid = jnp.asarray(np.ones(cfg.fft_size, dtype=bool))
    level = jnp.float32(8.0)

    half_depth = cfg.grouping_y - cfg.grouping_y // 2

    # prefix programs over one band-batch (vmapped like the bench step)
    def upto_power(st, x, t):
        return _frames_power(cfg, x)

    def upto_noise(st, x, t):
        power = _frames_power(cfg, x)
        ns, raw = noise_block(st.noise, power, t, cfg.noise_learning_ms)
        return raw

    def upto_avg(st, x, t):
        power = _frames_power(cfg, x)
        ns, raw = noise_block(st.noise, power, t, cfg.noise_learning_ms)
        av, mean_rows = averager_block(st.averager, raw)
        return sliding_average(mean_rows, cfg.grouping_x)

    def upto_detect(st, x, t):
        power = _frames_power(cfg, x)
        prev_tail = ordered_history(st.averager)[-(half_depth - 1):]
        ns, raw = noise_block(st.noise, power, t, cfg.noise_learning_ms)
        av, mean_rows = averager_block(st.averager, raw)
        avg_rows = sliding_average(mean_rows, cfg.grouping_x)
        c = compact_detection(avg_rows, raw, prev_tail, keys, valid, level, group_size, 64)
        # reduce EVERY output so XLA cannot dead-code-eliminate the history
        # vote / key argmax out of the cumulative number
        return (
            jnp.sum(c.cand_val)
            + jnp.sum(c.cand_best)
            + jnp.sum(c.cand_count)
            + jnp.sum(c.key_val)
            + jnp.sum(c.key_idx)
            + jnp.sum(c.cand_idx)
        )

    probes = {
        "power (dequant+frame+fft+psd)": upto_power,
        "+ noise": upto_noise,
        "+ averager + freq smoothing": upto_avg,
        "+ compact detection": upto_detect,
    }

    def timed(fn, *a):
        out = fn(*a)
        return float(np.asarray(out))

    # calibration floor
    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    tv = jax.device_put(np.ones(8, np.float32))
    timed(lambda v: tiny(v), tv)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        timed(lambda v: tiny(v), tv)
    floor = (time.perf_counter() - t0) / args.reps * 1000
    print(f"dispatch+fetch floor: {floor:.1f} ms")

    for name, fn in probes.items():
        prog = jax.jit(
            lambda st, x, t, f=fn: jnp.sum(jax.vmap(f, in_axes=(0, 0, 0))(st, x, t))
        )
        timed(prog, scan_state, iq, now)  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            timed(prog, scan_state, iq, now)
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{name}: {ms:.1f} ms/block")

    # detection sub-ops on resident random rows (isolates each sweep)
    from rtl_sdr_scanner_tpu.ops.detect import (
        K_SEP,
        _margin_separated_top,
        _mode_median_ties,
        _two_stage_top_k,
        _vote_windows_code,
        _windowed_argmax,
        sliding_argmax,
        sliding_argmax_code,
    )

    half = group_size // 2
    submargin = group_size // 2 if group_size % 2 == 0 else group_size // 2 + 1
    rows = jax.device_put(
        rng.standard_normal((nb, frames, cfg.fft_size)).astype(np.float32)
    )
    hist = jax.device_put(
        rng.standard_normal((nb, half_depth - 1 + frames, cfg.fft_size)).astype(np.float32)
    )

    def sub_topk(r, h):
        v, i = jax.vmap(lambda x: _two_stage_top_k(x, 64))(r)
        return jnp.sum(v) + jnp.sum(i)

    def sub_topk_patch(r, h):
        # ALTERNATIVE top-64 (k single-bin-zone patch winners, one pass):
        # reverted from production -- row-count-dependent, loses at small
        # row counts (BENCH.md round-4); kept probed for future A/Bs
        v, i = jax.vmap(lambda x: _margin_separated_top(x, 64, 0, per_pass=64))(r)
        return jnp.sum(v) + jnp.sum(i)

    def sub_margin(r, h):
        v, i = jax.vmap(lambda x: _margin_separated_top(x, K_SEP, submargin))(r)
        return jnp.sum(v) + jnp.sum(i)

    def sub_slidemax(r, h):
        v, i = jax.vmap(lambda x: sliding_argmax(x, half))(h)
        return jnp.sum(v) + jnp.sum(i)

    def sub_vote_code(r, h):
        # production vote: int8 code table + row gather + static row select
        def per_band(rows_b, hist_b):
            cand_idx = jnp.tile(jnp.arange(80, dtype=jnp.int32)[None, :], (frames, 1))
            code = sliding_argmax_code(hist_b, half, jnp.float32(8.0))
            codes = _vote_windows_code(code, cand_idx, half_depth)
            return jnp.sum(codes.astype(jnp.int32))

        return jnp.sum(jax.vmap(per_band)(r, h))

    def sub_vote(r, h):
        def per_band(rows_b, hist_b):
            cand_idx = jnp.tile(jnp.arange(80, dtype=jnp.int32)[None, :], (frames, 1))
            row_sel = (
                jnp.arange(frames, dtype=jnp.int32)[:, None]
                + jnp.arange(half_depth, dtype=jnp.int32)[None, :]
            )
            hv, hi = sliding_argmax(hist_b, half)
            lin = row_sel[:, :, None] * cfg.fft_size + cand_idx[:, None, :]
            vals = hv.reshape(-1)[lin]
            idxs = hi.reshape(-1)[lin]
            best = _mode_median_ties(
                jnp.swapaxes(idxs, 1, 2), jnp.swapaxes(vals >= 8.0, 1, 2), cand_idx
            )
            return jnp.sum(best)

        return jnp.sum(jax.vmap(per_band)(r, h))

    def sub_keys(r, h):
        v, i = jax.vmap(jax.vmap(lambda row: _windowed_argmax(row, keys, half, cfg.fft_size)))(r)
        return jnp.sum(v) + jnp.sum(i)

    for name, fn in {
        "sub: two-stage top-64": sub_topk,
        "sub: patch top-64 (reverted alt; see BENCH.md)": sub_topk_patch,
        "sub: int8-code vote (production)": sub_vote_code,
        "sub: margin-separated (16 sweeps)": sub_margin,
        "sub: sliding_argmax hist": sub_slidemax,
        "sub: hist vote (slidemax+gather+mode)": sub_vote,
        "sub: key windowed argmax": sub_keys,
    }.items():
        prog = jax.jit(fn)
        timed(prog, rows, hist)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            timed(prog, rows, hist)
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{name}: {ms:.1f} ms/block")

    # DDC alone (banded; modtap v2 when the geometry supports it)
    flat = iq.reshape(nb, -1, 2)
    ddc = jax.jit(
        lambda st, x, tb: _ddc_block_banded(ddc_cfg, nb, False, st, x, tb)[1]
        .astype(jnp.int32)
        .sum()
    )
    timed(ddc, ddc_state, flat, tables)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        timed(ddc, ddc_state, flat, tables)
    ms = (time.perf_counter() - t0) / args.reps * 1000
    kind = "modtap v2" if ddc_cfg.modtap else "matmul FIR v1"
    print(f"DDC (banded {kind}, 2 slots): {ms:.1f} ms/block")
    return 0


if __name__ == "__main__":
    sys.exit(main())
