"""Headline benchmark: sustained IQ samples/s/chip through scan + DDC.

Geometry: the reference's maximum demonstrated configuration -- 20.48 Msps
(HackRF-class), fft 131072, detection decimated to ~50 frames/s
(BASELINE.md). The reference is a realtime CPU application: it processes at
most sample_rate samples per second by design, so vs_baseline is the
realtime multiple: samples_per_second / 20.48e6.

Pipeline measured per block (one jitted scan step + one jitted DDC step over
the same uploaded block, all 8 recorder slots computing, detection rows
fetched back to host -- i.e. the full device path the runtime drives):
  int8 cs8 upload -> dequant -> frame/window/FFT/PSD -> noise -> averager
  -> freq smoothing -> spectrogram accumulate -> rows to host
  + 8-slot NCO rotate -> 2-stage polyphase resample -> int8 IQ out

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RATE = 20_480_000
BASELINE_SAMPLES_PER_S = 20_480_000.0  # reference realtime envelope
FRAMES = 20  # smallest multiple of 5 >= 16 (DDC divisibility at 20.48M/16k)
SLOTS = 8
WARMUP = 3
MIN_SECONDS = 8.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig, make_ddc_step
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import init_state as ddc_init
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import make_tables
    from rtl_sdr_scanner_tpu.models.scan_pipeline import (
        ScanConfig,
        init_scan_state,
        make_scan_step,
    )
    from rtl_sdr_scanner_tpu.ops.psd import dequantize_cs8

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    cfg = ScanConfig.create(RATE, frames_per_block=FRAMES)
    assert cfg.fft_size == 131072 and cfg.decimator_factor == 3
    group = cfg.fft_size * cfg.decimator_factor
    block = cfg.block_samples
    ddc_cfg = DdcConfig.create(RATE, 16000, SLOTS, block)

    scan_step = make_scan_step(cfg)
    ddc_step = make_ddc_step(ddc_cfg)

    rng = np.random.default_rng(0)
    n_host_blocks = 4
    host_blocks = [
        rng.integers(-32, 32, size=(FRAMES, group, 2), dtype=np.int8)
        for _ in range(n_host_blocks)
    ]
    frame_ms = cfg.frame_interval_ms

    scan_state = init_scan_state(cfg, 0)
    ddc_state = ddc_init(ddc_cfg)
    tables = make_tables(ddc_cfg, rng.integers(-RATE // 2, RATE // 2, size=SLOTS))

    def run_block(b: int, scan_state, ddc_state):
        iq_int8 = jax.device_put(host_blocks[b % n_host_blocks])
        now = ((b * FRAMES + 1 + np.arange(FRAMES)) * frame_ms).astype(np.int32)
        scan_state, outs = scan_step(scan_state, iq_int8, jnp.asarray(now))
        iq_flat = dequantize_cs8(iq_int8).reshape(-1)
        ddc_state, rec = ddc_step(ddc_state, iq_flat, tables)
        # host fetch of everything the runtime consumes
        raw = np.asarray(outs.raw)
        avg = np.asarray(outs.avg)
        spect = np.asarray(outs.spectro_sum)
        rec_np = np.asarray(rec)
        return scan_state, ddc_state, raw, avg, spect, rec_np

    for b in range(WARMUP):
        scan_state, ddc_state, *_ = run_block(b, scan_state, ddc_state)

    t0 = time.perf_counter()
    blocks_done = 0
    while True:
        scan_state, ddc_state, *_ = run_block(WARMUP + blocks_done, scan_state, ddc_state)
        blocks_done += 1
        elapsed = time.perf_counter() - t0
        if elapsed >= MIN_SECONDS and blocks_done >= 8:
            break

    samples = blocks_done * block
    rate = samples / elapsed
    print(
        f"{blocks_done} blocks x {block} samples in {elapsed:.2f}s "
        f"({rate/1e6:.1f} Msamples/s, {rate/RATE:.1f}x realtime)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "iq_samples_per_second_scan_plus_ddc",
                "value": round(rate, 1),
                "unit": "samples/s",
                "vs_baseline": round(rate / BASELINE_SAMPLES_PER_S, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
