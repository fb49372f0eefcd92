#!/usr/bin/env python3
"""Sub-stage device timing of compact detection (ops/detect.py).

Probes each piece over the benchmark geometry (32 bands x 20 frames x fft
131072) on top of a precomputed smoothed/raw row set, so the deltas isolate
detection itself: two-stage top-k, margin-separated greedy, history-vote
sliding argmax + mode, per-key windowed argmax.

Usage (real chip, background):
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_detect.py
"""

from __future__ import annotations

import argparse
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
    parser.add_argument("--fft", type=int, default=131072)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.ops.detect import (
        K_SEP,
        _margin_separated_top,
        _mode_median_ties,
        _pooled_top_k,
        _two_stage_top_k,
        _windowed_argmax,
        sliding_argmax,
    )

    nb, f, fft = args.bands, args.frames, args.fft
    group_size = 103  # ceil(16000 / 156.25)
    half = group_size // 2
    submargin = half + (group_size % 2)
    top_k = 64
    half_depth = 11

    rng = np.random.default_rng(0)
    avg = jax.device_put(rng.standard_normal((nb, f, fft)).astype(np.float32))
    hist = jax.device_put(
        rng.standard_normal((nb, half_depth - 1 + f, fft)).astype(np.float32)
    )
    keys = jnp.asarray(np.full(16, -1, dtype=np.int32))
    level = jnp.float32(0.5)

    def timed(label, prog, *a):
        float(np.asarray(prog(*a)))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(np.asarray(prog(*a)))
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{label}: {ms:.1f} ms/block")

    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    timed("dispatch+fetch floor", tiny, jax.device_put(np.ones(8, np.float32)))

    topk = jax.jit(lambda a: _two_stage_top_k(a.reshape(nb * f, fft), top_k)[0].sum())
    timed(f"two-stage top-{top_k}", topk, avg)

    ptopk = jax.jit(lambda a: _pooled_top_k(a.reshape(nb * f, fft), top_k)[0].sum())
    timed(f"pooled top-{top_k}", ptopk, avg)

    from rtl_sdr_scanner_tpu.ops.detect import _margin_separated_top_1per

    sep1 = jax.jit(
        lambda a: jax.vmap(lambda r: _margin_separated_top_1per(r, K_SEP, submargin)[0])(a).sum()
    )
    timed(f"margin-separated 1-per-pass x{K_SEP}", sep1, avg)

    sep = jax.jit(
        lambda a: jax.vmap(lambda r: _margin_separated_top(r, K_SEP, submargin)[0])(a).sum()
    )
    timed(f"margin-separated 2-per-pass x{K_SEP // 2}", sep, avg)

    slarg = jax.jit(lambda h: sliding_argmax(h, half)[0].sum())
    timed("history sliding_argmax", slarg, hist)

    def vote_flat(h, a):
        hv, hi = sliding_argmax(h, half)
        _, cand_idx = _two_stage_top_k(a, top_k)  # [NB, F, K] via leading dims
        row_sel = (
            jnp.arange(f, dtype=jnp.int32)[:, None]
            + jnp.arange(half_depth, dtype=jnp.int32)[None, :]
        )

        def per_band(hvb, hib, cib):
            lin = row_sel[:, :, None] * fft + cib[:, None, :]
            vals = hvb.reshape(-1)[lin]
            idxs = hib.reshape(-1)[lin]
            return _mode_median_ties(
                jnp.swapaxes(idxs, 1, 2), jnp.swapaxes(vals, 1, 2) >= level, cib
            ).sum()

        return jax.vmap(per_band)(hv, hi, cand_idx).sum()

    timed("vote flat-gather (slarg + gather + mode)", jax.jit(vote_flat), hist, avg)

    def vote_rowgather(h, a):
        from rtl_sdr_scanner_tpu.ops.detect import (
            _mode_median_ties_unrolled,
            _vote_windows,
        )

        hv, hi = sliding_argmax(h, half)
        _, cand_idx = _two_stage_top_k(a, top_k)

        def per_band(hvb, hib, cib):
            vals, idxs = _vote_windows(hvb, hib, cib, half_depth)
            return _mode_median_ties_unrolled(idxs, vals >= level, cib).sum()

        return jax.vmap(per_band)(hv, hi, cand_idx).sum()

    timed("vote row-gather (slarg + T/onehot + unrolled mode)", jax.jit(vote_rowgather), hist, avg)

    key_arg = jax.jit(
        lambda a: jax.vmap(
            lambda rows: jax.vmap(lambda r: _windowed_argmax(r, keys, half, fft)[0])(rows)
        )(a).sum()
    )
    timed("per-key windowed argmax", key_arg, avg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
