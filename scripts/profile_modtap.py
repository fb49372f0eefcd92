#!/usr/bin/env python3
"""A/B the modulated-taps DDC stage-1 matmul in f32 vs bf16 operands.

The DDC is ~65 ms net at 32 bands x F=45 (BENCH.md per-stage); stage 1 is
one [NB, 2*n_chunks, C] @ [NB, C, K*2*D*P] dot_general. If it is
MXU-f32-compute-bound, bf16 operands (f32 accumulation) buy 2-4x on the
contraction at a bounded recording-precision cost; if it is layout/
bandwidth-bound, bf16 buys ~2x bytes at most. This probe decides whether
the tolerance-contract work is worth it.

Usage (real chip, BACKGROUND per CLAUDE.md):
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_modtap.py
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
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--frames", type=int, default=45)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig
    from rtl_sdr_scanner_tpu.models.scan_pipeline import ScanConfig
    from rtl_sdr_scanner_tpu.ops.ddc import _modtap_stage1

    nb, frames, k = args.bands, args.frames, 2
    cfg = ScanConfig.create(RATE, frames_per_block=frames)
    ddc_cfg = DdcConfig.create(RATE, 16000, k, cfg.block_samples)
    p0 = ddc_cfg.plans[0]
    chunk = ddc_cfg.chunk
    n_chunks = ddc_cfg.num_chunks
    c = p0.chunk_c
    cols = k * 2 * p0.chunk_d * (c // p0.decim)
    print(
        f"plan: decim {p0.decim}, C {c}, D {p0.chunk_d}, cols {cols}, "
        f"chunk {chunk} x {n_chunks} chunks",
        flush=True,
    )

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((nb, 2, chunk)).astype(np.float32))
    x_tail = jax.device_put(
        rng.standard_normal((nb, 2, p0.tail_len)).astype(np.float32)
    )
    w = jax.device_put(rng.standard_normal((nb, c, cols)).astype(np.float32))

    def timed(label, prog, *a):
        float(np.asarray(prog(*a)))
        vals = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(np.asarray(prog(*a)))
            vals.append((time.perf_counter() - t0) * 1000)
        med = sorted(vals)[len(vals) // 2]
        print(
            f"{label}: median {med:.1f} ms ({n_chunks} chunks/block => "
            f"{med * n_chunks:.1f} ms/block) (n={len(vals)}, "
            f"min {min(vals):.1f}, max {max(vals):.1f})",
            flush=True,
        )

    def stage1_f32(x, x_tail, w):
        y_re, y_im, _ = _modtap_stage1(x, x_tail, w, p0, k)
        return jnp.sum(y_re[..., ::512]) + jnp.sum(y_im[..., ::512])

    def stage1_bf16(x, x_tail, w):
        y_re, y_im, _ = _modtap_stage1(
            x.astype(jnp.bfloat16).astype(jnp.float32),
            x_tail.astype(jnp.bfloat16).astype(jnp.float32),
            w,
            p0,
            k,
            bf16=True,
        )
        return jnp.sum(y_re[..., ::512]) + jnp.sum(y_im[..., ::512])

    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    timed("dispatch+fetch floor", tiny, jax.device_put(np.ones(8, np.float32)))
    timed("stage1 f32 (one chunk)", jax.jit(stage1_f32), x, x_tail, w)
    timed("stage1 bf16 operands (one chunk)", jax.jit(stage1_bf16), x, x_tail, w)
    return 0


if __name__ == "__main__":
    sys.exit(main())
