#!/usr/bin/env python3
"""A/B the sliding-argmax structures on real hardware.

Contenders for the history-vote table (ops/detect.py sliding_argmax):
- "doubling": current sparse table (6 levels, int8 offsets).
- "vanherk": block prefix/suffix scans of width w, 2-lookup combine
  (van Herk / Gil-Werman erosion trick adapted to (max, first-idx)).

Both are exact; run on CPU first to check equivalence, then on TPU to time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sliding_argmax_vanherk(rows, half):
    import jax.numpy as jnp

    *lead, n = rows.shape
    w = 2 * half + 1
    pad_cfg = [(0, 0)] * len(lead)
    neg = -jnp.inf
    nb = -(-(n + 2 * half) // w)  # blocks covering padded coords
    total = nb * w
    v = jnp.pad(
        rows.astype(jnp.float32), pad_cfg + [(half, total - n - half)], constant_values=neg
    ).reshape(*lead, nb, w)
    off = jnp.zeros(v.shape, dtype=jnp.int8)

    # in-block prefix (max, first-idx) via doubling along the minor axis
    pv, po = v, off
    step = 1
    while step < w:
        sv = jnp.pad(pv[..., :-step], pad_cfg + [(0, 0), (step, 0)], constant_values=neg)
        so = jnp.pad(po[..., :-step], pad_cfg + [(0, 0), (step, 0)])
        take = sv >= pv  # earlier wins ties
        pv = jnp.where(take, sv, pv)
        po = jnp.where(take, so + jnp.int8(step), po)
        step *= 2
    # po currently holds distance from the max to position i; prefix idx =
    # i - po (absolute within block)

    # in-block suffix via doubling (offset forward from i)
    sv_, so_ = v, off
    step = 1
    while step < w:
        sh = jnp.pad(sv_[..., step:], pad_cfg + [(0, 0), (0, step)], constant_values=neg)
        oh = jnp.pad(so_[..., step:], pad_cfg + [(0, 0), (0, step)])
        take = sv_ >= sh  # earlier wins ties
        sv_ = jnp.where(take, sv_, sh)
        so_ = jnp.where(take, so_, oh + jnp.int8(step))
        step *= 2

    pvf = pv.reshape(*lead, total)
    pof = po.reshape(*lead, total)
    svf = sv_.reshape(*lead, total)
    sof = so_.reshape(*lead, total)
    # window [c, c+w-1] in padded coords: suffix at c (to block end) +
    # prefix at c+w-1 (from next block start); at o==0 the window IS block b
    lv = svf[..., :n]
    lo = sof[..., :n]
    rv = pvf[..., w - 1 : w - 1 + n]
    ro = pof[..., w - 1 : w - 1 + n]
    take_l = lv >= rv  # both parts cover the window exactly; left wins ties
    pos = jnp.arange(n, dtype=jnp.int32) - half
    idx = jnp.where(
        take_l,
        pos + lo.astype(jnp.int32),
        pos + (w - 1) - ro.astype(jnp.int32),
    )
    val = jnp.where(take_l, lv, rv)
    return val, idx


def sliding_argmax_levels(rows, half, max_levels):
    """Doubling table stopped early: span 2^max_levels, multi-span combine.

    Fewer full-array level passes, more (cheap) combine lookups; exact."""
    import jax.numpy as jnp

    *lead, n = rows.shape
    w = 2 * half + 1
    j_max = 0
    while (1 << (j_max + 1)) <= w and j_max + 1 <= max_levels:
        j_max += 1
    span = 1 << j_max
    neg = -jnp.inf
    total = n + 2 * half + span
    pad_cfg = [(0, 0)] * len(lead)
    v = jnp.pad(
        rows.astype(jnp.float32), pad_cfg + [(half, total - n - half)], constant_values=neg
    )
    off8 = jnp.zeros(v.shape, dtype=jnp.int8)
    for j in range(j_max):
        step = 1 << j
        sv = jnp.pad(v[..., step:], pad_cfg + [(0, step)], constant_values=neg)
        so = jnp.pad(off8[..., step:], pad_cfg + [(0, step)])
        take = v >= sv
        v = jnp.where(take, v, sv)
        off8 = jnp.where(take, off8, so + jnp.int8(step))

    # cover [c, c+w-1] with ceil(w/span) spans; left-to-right keeps first-idx
    import numpy as _np

    starts = list(range(0, w - span, span)) + [w - span]
    pos = jnp.arange(n, dtype=jnp.int32) - half
    bv = v[..., :n]
    bi = pos + off8[..., :n].astype(jnp.int32)
    for s in starts[1:]:
        cv = v[..., s : s + n]
        ci = pos + s + off8[..., s : s + n].astype(jnp.int32)
        take = bv >= cv
        bv = jnp.where(take, bv, cv)
        bi = jnp.where(take, bi, ci)
    return bv, bi


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bands", type=int, default=32)
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument("--check", action="store_true", help="CPU equivalence check")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.ops.detect import sliding_argmax

    half = 51  # group 103
    rng = np.random.default_rng(0)
    if args.check:
        for trial in range(3):
            rows = rng.standard_normal((5, 2000)).astype(np.float32)
            if trial == 2:
                rows = np.round(rows)  # force ties
            v0, i0 = jax.jit(lambda r: sliding_argmax(r, half))(rows)
            for alt in (
                lambda r: sliding_argmax_vanherk(r, half),
                lambda r: sliding_argmax_levels(r, half, 5),
                lambda r: sliding_argmax_levels(r, half, 4),
            ):
                v1, i1 = jax.jit(alt)(rows)
                np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
                np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        print("equivalence OK (incl. ties)")
        return 0

    hist = jax.device_put(
        rng.standard_normal((args.bands, 30, 131072)).astype(np.float32)
    )

    def timed(prog):
        out = prog(hist)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(np.asarray(prog(hist)))
        return (time.perf_counter() - t0) / args.reps * 1000

    for name, fn in (
        ("doubling", sliding_argmax),
        ("doubling-5lvl", lambda r, h: sliding_argmax_levels(r, h, 5)),
        ("doubling-4lvl", lambda r, h: sliding_argmax_levels(r, h, 4)),
        ("vanherk", sliding_argmax_vanherk),
    ):
        prog = jax.jit(
            lambda h, f=fn: sum(
                jnp.sum(x) for x in jax.vmap(lambda r: f(r, half))(h)
            )
        )
        print(f"{name}: {timed(prog):.1f} ms/block")
    return 0


if __name__ == "__main__":
    sys.exit(main())
