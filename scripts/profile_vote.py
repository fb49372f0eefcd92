#!/usr/bin/env python3
"""A/B the history-vote implementations at production geometry (round 5).

Compares, at [bands x frames x fft] with the production 103-bin windows and
K=80 candidates:
- the round-4 int8-code sliding table (sliding_argmax_code +
  _vote_windows_code + unrolled mode) -- the shipped form, measured
  lane-rotation-bound (~30 ms net at 32x45);
- the candidate-window block-gather form (_vote_windows_gather + mode),
  which computes only the consumed (candidate, row) cells.

Usage (real chip, BACKGROUND per CLAUDE.md):
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_vote.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--frames", type=int, default=45)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fft", type=int, default=131072)
    ap.add_argument("--f32", action="store_true", help="exact mode (default bf16)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.ops import detect

    nb, f, fft = args.bands, args.frames, args.fft
    half = 103 // 2
    half_depth = 11
    k_total = 64 + detect.K_SEP
    bf16 = not args.f32

    rng = np.random.default_rng(0)
    hist = jax.device_put(
        rng.standard_normal((nb, half_depth - 1 + f, fft)).astype(np.float32)
    )
    cand = jax.device_put(
        rng.integers(0, fft, size=(nb, f, k_total)).astype(np.int32)
    )
    level = jnp.float32(0.5)

    def timed(label, prog, *a):
        float(np.asarray(prog(*a)))  # compile + sync
        vals = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(np.asarray(prog(*a)))
            vals.append((time.perf_counter() - t0) * 1000)
        med = sorted(vals)[len(vals) // 2]
        print(
            f"{label}: median {med:.1f} ms (n={len(vals)}, "
            f"min {min(vals):.1f}, max {max(vals):.1f})",
            flush=True,
        )

    prep = (lambda h: h.astype(jnp.bfloat16)) if bf16 else (lambda h: h)

    def make_vote_code(levels):
        def vote_code(h, c):
            def per_band(hb, cb):
                tbl = detect.sliding_argmax_code(
                    prep(hb), half, level, max_levels=levels
                )
                codes = detect._vote_windows_code(tbl, cb, half_depth)
                valid = codes >= 0
                idxs = (cb[:, None, :] - half) + codes.astype(jnp.int32)
                return detect._mode_median_ties_unrolled(idxs, valid, cb).sum()

            return jax.vmap(per_band)(h, c).sum()

        return vote_code

    vote_code = make_vote_code(4)

    def vote_gather(h, c):
        def per_band(hb, cb):
            idxs, valid = detect._vote_windows_gather(
                prep(hb), cb, half, level, half_depth
            )
            return detect._mode_median_ties_unrolled(idxs, valid, cb).sum()

        return jax.vmap(per_band)(h, c).sum()

    # --- sub-stage probes of the gather form --------------------------------
    w = 2 * half + 1

    def sub_transpose(h):
        def per_band(hb):
            hb = prep(hb)
            return jnp.pad(
                hb, [(0, 0), (half, half)], constant_values=-jnp.inf
            ).T.astype(jnp.float32).sum()

        return jax.vmap(per_band)(h).sum()

    def sub_gather(h, c):
        def per_band(hb, cb):
            hb = prep(hb)
            r_rows = hb.shape[0]
            ht = jnp.pad(hb, [(0, 0), (half, half)], constant_values=-jnp.inf).T
            starts = cb.reshape(-1)
            g = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    ht, (s, jnp.zeros((), s.dtype)), (w, r_rows)
                )
            )(starts)
            return g.astype(jnp.float32).sum()

        return jax.vmap(per_band)(h, c).sum()

    def sub_reduce(h, c):
        def per_band(hb, cb):
            hb = prep(hb)
            r_rows = hb.shape[0]
            ht = jnp.pad(hb, [(0, 0), (half, half)], constant_values=-jnp.inf).T
            starts = cb.reshape(-1)
            g = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    ht, (s, jnp.zeros((), s.dtype)), (w, r_rows)
                )
            )(starts)
            vmax = jnp.max(g, axis=1)
            varg = jnp.argmax(g, axis=1)
            return vmax.astype(jnp.float32).sum() + varg.sum()

        return jax.vmap(per_band)(h, c).sum()

    # minor-axis slice variant: NO transpose; slices [R, w] strided reads
    def vote_minor(h, c):
        def per_band(hb, cb):
            hb = prep(hb)
            r_rows = hb.shape[0]
            hp = jnp.pad(hb, [(0, 0), (half, half)], constant_values=-jnp.inf)
            starts = cb.reshape(-1)
            g = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    hp, (jnp.zeros((), s.dtype), s), (r_rows, w)
                )
            )(starts)  # [F*K, R, w]
            vmax = jnp.max(g, axis=2).reshape(f, k_total, r_rows)
            varg = jnp.argmax(g, axis=2).astype(jnp.int32).reshape(f, k_total, r_rows)
            sel = jnp.asarray(detect._vote_row_select(f, half_depth))
            sel_b = jnp.broadcast_to(sel, (f, k_total, half_depth))
            pick_max = jnp.take_along_axis(vmax, sel_b, axis=2)
            pick_arg = jnp.take_along_axis(varg, sel_b, axis=2)
            valid = (pick_max >= level).transpose(0, 2, 1)
            idxs = (cb[:, :, None] - half + pick_arg).transpose(0, 2, 1)
            return detect._mode_median_ties_unrolled(idxs, valid, cb).sum()

        return jax.vmap(per_band)(h, c).sum()

    # mode alone on representative shapes
    votes_np = rng.integers(0, fft, size=(nb, f, half_depth, k_total)).astype(np.int32)
    valid_np = rng.random((nb, f, half_depth, k_total)) > 0.4
    fb_np = rng.integers(0, fft, size=(nb, f, k_total)).astype(np.int32)
    votes_d = jax.device_put(votes_np)
    valid_d = jax.device_put(valid_np)
    fb_d = jax.device_put(fb_np)

    def mode_only(v, ok, fb):
        return jax.vmap(detect._mode_median_ties_unrolled)(v, ok, fb).sum()

    # [H, w] slices: only the 11 consumed rows per candidate (5x fewer
    # bytes than [w, R] blocks; tests whether the gather is byte-bound or
    # slice-count-bound)
    def vote_minor_h(h, c):
        def per_band(hb, cb):
            hb = prep(hb)
            hp = jnp.pad(hb, [(0, 0), (half, half)], constant_values=-jnp.inf)
            rows = jnp.repeat(jnp.arange(f, dtype=jnp.int32), k_total)
            cols = cb.reshape(-1)
            g = jax.vmap(
                lambda rs, cs: jax.lax.dynamic_slice(
                    hp, (rs, cs), (half_depth, w)
                )
            )(rows, cols)  # [F*K, H, w]
            vmax = jnp.max(g, axis=2).reshape(f, k_total, half_depth)
            varg = jnp.argmax(g, axis=2).astype(jnp.int32).reshape(
                f, k_total, half_depth
            )
            valid = (vmax >= level).transpose(0, 2, 1)
            idxs = (cb[:, :, None] - half + varg).transpose(0, 2, 1)
            return detect._mode_median_ties_unrolled(idxs, valid, cb).sum()

        return jax.vmap(per_band)(h, c).sum()

    # span-table hybrid: 4-level doubling build (NO per-center combine),
    # then 7 anchor ROW-gathers per table at the candidates (the fast
    # gather class _vote_windows uses), combine on tiny [F, K, R] arrays
    def vote_span_rowgather(h, c):
        from rtl_sdr_scanner_tpu.ops.detect import _sliding_span_tables

        def per_band(hb, cb):
            hb = prep(hb)
            v, off8, span, w_ = _sliding_span_tables(hb, half, 4)
            starts = list(range(0, w_ - span, span)) + [w_ - span]
            v_t, o_t = v.T, off8.T  # [n + 2*half + span, R]
            bv = v_t[cb]  # [F, K, R] row gather at anchor 0
            rel = o_t[cb].astype(jnp.int32)
            for s in starts[1:]:
                cv = v_t[cb + s]
                co = o_t[cb + s].astype(jnp.int32)
                take = bv >= cv
                bv = jnp.where(take, bv, cv)
                rel = jnp.where(take, rel, s + co)
            sel = jnp.asarray(detect._vote_row_select(f, half_depth))
            sel_b = jnp.broadcast_to(sel, (f, k_total, half_depth))
            pick_max = jnp.take_along_axis(bv, sel_b, axis=2)
            pick_rel = jnp.take_along_axis(rel, sel_b, axis=2)
            valid = (pick_max >= level).transpose(0, 2, 1)
            idxs = (cb[:, :, None] - half + pick_rel).transpose(0, 2, 1)
            return detect._mode_median_ties_unrolled(idxs, valid, cb).sum()

        return jax.vmap(per_band)(h, c).sum()

    def sub_span_build(h):
        from rtl_sdr_scanner_tpu.ops.detect import _sliding_span_tables

        def per_band(hb):
            v, off8, span, w_ = _sliding_span_tables(prep(hb), half, 4)
            return v.astype(jnp.float32).sum() + off8.astype(jnp.int32).sum()

        return jax.vmap(per_band)(h).sum()

    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    timed("dispatch+fetch floor", tiny, jax.device_put(np.ones(8, np.float32)))
    timed("vote int8-code table", jax.jit(vote_code), hist, cand)
    # round-4 A/B only went UP from 4 levels (4/5/6: 59.8/63.1/69.4 ms,
    # monotonic) -- probe DOWN too: fewer doubling passes, more span
    # combines (shorter lane rotations)
    timed("vote code 3 levels", jax.jit(make_vote_code(3)), hist, cand)
    timed("vote code 2 levels", jax.jit(make_vote_code(2)), hist, cand)
    timed("vote block-gather", jax.jit(vote_gather), hist, cand)
    timed("vote minor-slice (no transpose)", jax.jit(vote_minor), hist, cand)
    timed("vote [H,w]-slice", jax.jit(vote_minor_h), hist, cand)
    timed("vote span4+rowgather", jax.jit(vote_span_rowgather), hist, cand)
    timed("sub: span4 build only", jax.jit(sub_span_build), hist)
    timed("sub: pad+transpose only", jax.jit(sub_transpose), hist)
    timed("sub: +block gather", jax.jit(sub_gather), hist, cand)
    timed("sub: +reduce", jax.jit(sub_reduce), hist, cand)
    timed("sub: mode only", jax.jit(mode_only), votes_d, valid_d, fb_d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
