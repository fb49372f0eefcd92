"""Roofline accounting for the headline bench geometry (VERDICT r2 weak #1).

Compiles the production banded fused step (32 bands x F frames, fft 131072)
and reads XLA's own cost analysis off the executable: bytes accessed and
flops. Combined with the measured block time (bench.py) this answers "what
fraction of the v5e memory-bound ceiling does 1.5 G samples/s represent" --
the number the next perf decision (tolerance mode? fewer sweeps?) needs.

Run on the real chip:
  env PYTHONPATH=/root/repo:$PYTHONPATH python scripts/roofline.py > /tmp/roofline.out 2>&1 &
Also runs on CPU (cost analysis of the CPU HLO differs from TPU's; the TPU
run is the one that counts).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

RATE = 20_480_000
BANDS = 32
FRAMES = 45
SLOTS = 2
HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec: ~819 GB/s)


def main() -> int:
    global BANDS, FRAMES
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=BANDS)
    ap.add_argument("--frames", type=int, default=FRAMES)
    args = ap.parse_args()
    BANDS, FRAMES = args.bands, args.frames

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import (
        DdcConfig,
        fold_banded,
        init_state as ddc_init,
        make_tables,
    )
    from rtl_sdr_scanner_tpu.models.fused_step import _fused_block, make_banded_fused_step
    from rtl_sdr_scanner_tpu.models.scan_pipeline import (
        ScanConfig,
        init_scan_state,
        init_spectro_acc,
    )

    cfg = ScanConfig.create(RATE, frames_per_block=FRAMES)
    group = cfg.fft_size * cfg.decimator_factor
    block = cfg.block_samples
    ddc_cfg = DdcConfig.create(RATE, 16000, SLOTS, block)
    group_size = int(np.ceil(16000 / cfg.step_hz))
    step = make_banded_fused_step(cfg, ddc_cfg, group_size, 64)

    rng = np.random.default_rng(0)
    stack = lambda a: jnp.broadcast_to(a, (BANDS,) + a.shape)
    scan_state = jax.tree.map(stack, init_scan_state(cfg, 0))
    spectro_acc = stack(init_spectro_acc(cfg))
    ddc_state = fold_banded(jax.tree.map(stack, ddc_init(ddc_cfg)))
    tables = fold_banded(
        jax.tree.map(
            stack, make_tables(ddc_cfg, rng.integers(-RATE // 2, RATE // 2, size=SLOTS))
        )
    )
    iq = rng.integers(-32, 32, size=(BANDS, FRAMES, group, 2), dtype=np.int8)
    now = jnp.broadcast_to(
        ((1 + np.arange(FRAMES)) * cfg.frame_interval_ms).astype(np.int32),
        (BANDS, FRAMES),
    )
    keys = jnp.asarray(np.full(16, -1, dtype=np.int32))
    valid = jnp.asarray(np.ones(cfg.fft_size, dtype=bool))

    lowered = step.lower(
        scan_state, spectro_acc, ddc_state, jnp.asarray(iq), now, keys, valid,
        jnp.float32(8.0), jnp.float32(1.0), tables,
    )
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]

    samples = BANDS * block
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    flops = float(cost.get("flops", 0.0))
    mem_floor_ms = bytes_acc / (HBM_GBPS * 1e9) * 1e3
    out = {
        "device": jax.devices()[0].device_kind,
        "geometry": f"{BANDS} bands x {FRAMES} frames x fft {cfg.fft_size}",
        "samples_per_block": samples,
        "bytes_accessed": bytes_acc,
        "bytes_per_sample": bytes_acc / samples,
        "flops": flops,
        "hbm_memory_floor_ms": round(mem_floor_ms, 2),
        "roofline_samples_per_s_at_hbm": round(samples / (mem_floor_ms / 1e3), 1)
        if mem_floor_ms
        else None,
    }
    # per-memory-space detail when the backend reports it
    for k, v in sorted(cost.items()):
        if "bytes accessed" in k and k != "bytes accessed":
            out[k] = float(v)
    # peak HBM residency (round-4 verdict weak #3: the 48-band ceiling) --
    # temp allocations + arguments + outputs of the compiled executable
    try:
        mem = compiled.memory_analysis()
        for attr in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(mem, attr, None)
            if v is not None:
                out[attr] = int(v)
        t = out.get("temp_size_in_bytes", 0)
        a = out.get("argument_size_in_bytes", 0)
        o = out.get("output_size_in_bytes", 0)
        al = out.get("alias_size_in_bytes", 0)
        out["peak_hbm_estimate_gb"] = round((t + a + o - al) / 1e9, 3)
    except Exception as exc:  # memory_analysis absent on some backends
        out["memory_analysis_error"] = str(exc)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
