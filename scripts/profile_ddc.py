#!/usr/bin/env python3
"""Sub-stage device timing of the banded DDC block (BENCH.md methodology).

Probes prefixes of ops/ddc.ddc_chunk_banded over the benchmark geometry to
locate where the DDC's time goes: rotation, each FIR stage, quantize, and the
chunked lax.scan structure itself (single-chunk variant). Timing fetches a
scalar (np.asarray) because jax.block_until_ready does not synchronize on the
axon tunnel.

Usage (real chip, background):
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_ddc.py
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
    parser.add_argument("--rate", type=int, default=20_480_000)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import (
        DdcConfig,
        _ddc_block_banded,
        fold_banded,
        make_tables,
    )
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import init_state as ddc_init
    from rtl_sdr_scanner_tpu.models.scan_pipeline import ScanConfig
    from rtl_sdr_scanner_tpu.ops import ddc as ddc_ops

    nb, frames, rate = args.bands, args.frames, args.rate
    cfg = ScanConfig.create(rate, frames_per_block=frames)
    block = cfg.block_samples
    ddc_cfg = DdcConfig.create(rate, 16000, 2, block)
    print(
        f"block={block} chunk={ddc_cfg.chunk} num_chunks={ddc_cfg.num_chunks} "
        f"stages={[(p.interp, p.decim, p.ntaps, p.chunk_c, p.chunk_d) for p in ddc_cfg.plans]}"
    )

    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-32, 32, size=(nb, block, 2), dtype=np.int8))
    stack = lambda a: jnp.broadcast_to(a, (nb,) + a.shape)
    state = fold_banded(jax.tree.map(stack, ddc_init(ddc_cfg)))
    tables = fold_banded(
        jax.tree.map(stack, make_tables(ddc_cfg, rng.integers(-rate // 2, rate // 2, size=2)))
    )

    def timed(label, prog, *a):
        out = prog(*a)
        float(np.asarray(out))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(np.asarray(prog(*a)))
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{label}: {ms:.1f} ms/block")

    tiny = jax.jit(lambda v: jnp.sum(v) * 0)
    tv = jax.device_put(np.ones(8, np.float32))
    timed("dispatch+fetch floor", tiny, tv)

    # --- rotation only, scanned like production -----------------------------
    def rot_chunk(chunk_iq, st):
        k_total = st.phase.shape[0]
        k = k_total // nb
        ph_re = jnp.cos(st.phase).reshape(nb, k, 1)
        ph_im = jnp.sin(st.phase).reshape(nb, k, 1)
        c_re = ph_re * tables.coarse_re.reshape(nb, k, -1) - ph_im * tables.coarse_im.reshape(nb, k, -1)
        c_im = ph_re * tables.coarse_im.reshape(nb, k, -1) + ph_im * tables.coarse_re.reshape(nb, k, -1)
        f_re = tables.fine_re.reshape(nb, k, 1, -1)
        f_im = tables.fine_im.reshape(nb, k, 1, -1)
        chunk = chunk_iq.shape[1]
        rot_re = (c_re[..., None] * f_re - c_im[..., None] * f_im).reshape(nb, k, chunk)
        rot_im = (c_re[..., None] * f_im + c_im[..., None] * f_re).reshape(nb, k, chunk)
        x_re = (chunk_iq[..., 0].astype(jnp.float32) * (1.0 / 127.5))[:, None, :]
        x_im = (chunk_iq[..., 1].astype(jnp.float32) * (1.0 / 127.5))[:, None, :]
        y = jnp.stack(
            [x_re * rot_re - x_im * rot_im, x_re * rot_im + x_im * rot_re], axis=2
        ).reshape(nb * k, 2, chunk)
        return y

    def rot_only(st, x):
        chunks = jnp.moveaxis(x.reshape(nb, ddc_cfg.num_chunks, ddc_cfg.chunk, 2), 1, 0)

        def body(carry, chunk_iq):
            y = rot_chunk(chunk_iq, st)
            return carry, jnp.sum(y)

        _, s = jax.lax.scan(body, 0.0, chunks)
        return jnp.sum(s)

    timed("rotation only (scanned)", jax.jit(rot_only), state, iq)

    # --- rotation + stage prefixes ------------------------------------------
    def upto_stage(n_stages):
        def f(st, x):
            chunks = jnp.moveaxis(x.reshape(nb, ddc_cfg.num_chunks, ddc_cfg.chunk, 2), 1, 0)

            def body(carry, chunk_iq):
                y = rot_chunk(chunk_iq, st)
                acc = jnp.float32(0)
                for plan, tail in zip(ddc_cfg.plans[:n_stages], st.tails[:n_stages]):
                    y, _ = ddc_ops._stage_apply(y, tail, plan)
                return carry, jnp.sum(y)

            _, s = jax.lax.scan(body, 0.0, chunks)
            return jnp.sum(s)

        return f

    for i in range(1, len(ddc_cfg.plans) + 1):
        timed(f"rotation + stages[:{i}] (scanned)", jax.jit(upto_stage(i)), state, iq)

    # --- full production path ------------------------------------------------
    full = jax.jit(
        lambda st, x: _ddc_block_banded(ddc_cfg, nb, False, st, x, tables)[1]
        .astype(jnp.int32)
        .sum()
    )
    timed("full banded DDC (XLA matmul FIR)", full, state, iq)
    return 0


if __name__ == "__main__":
    sys.exit(main())
