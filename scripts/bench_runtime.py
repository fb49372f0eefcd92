#!/usr/bin/env python3
"""Runtime end-to-end throughput: the REAL application loop, host half included.

Complements bench.py (device-program throughput from an HBM ingest ring) by
measuring what the application actually sustains:

1. "runtime" -- Scanner.step() over a looped cs8 capture: host block reads,
   host->device upload, fused device dispatch, compact fetch, tracker,
   recorder reconcile, egress encode (NullMqtt). On this environment the
   TPU sits behind a ~40 MB/s tunnel, so the upload bounds this number;
   a real TPU host feeds over PCIe (order 10 GB/s). The tracker/egress
   cost is measured separately so the gap attribution is explicit.
2. "tracker" -- host-only TransmissionTracker.process_compact rows/s on a
   synthetic busy workload (the per-frame Python cost the device cannot
   absorb). The reference detector consumes <=50 rows/s/band
   (config.h:32); this reports the headroom multiple.

Usage:
  python scripts/bench_runtime.py [--seconds 8] [--rate 20480000] [--cpu]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_tracker(seconds: float) -> dict:
    from rtl_sdr_scanner_tpu.constants import Tunables
    from rtl_sdr_scanner_tpu.runtime.transmission_tracker import TransmissionTracker

    fft = 131072
    step_hz = 20480000 / fft
    tracker = TransmissionTracker(
        fft_size=fft,
        group_size=103,
        start_level=8.0,
        stop_level=5.0,
        recording_min_time_ms=1000,
        recording_timeout_ms=2000,
        tuning_step=2500,
        index_to_shift=lambda i: int(step_hz * (i + 0.5)) - 10240000,
        index_to_frequency=lambda i: 145_000_000 + int(step_hz * (i + 0.5)) - 10240000,
        is_index_in_range=lambda i: True,
        ignored_ranges=[],
        tunables=Tunables(),
    )
    rng = np.random.default_rng(0)
    k, s = 80, 16
    # busy frames: 3 live signals + noise candidates
    cand_idx = rng.integers(0, fft, size=(64, k)).astype(np.int32)
    cand_val = rng.uniform(-20, 5, size=(64, k)).astype(np.float32)
    cand_val[:, :3] = 12.0
    cand_idx[:, 0] = 30000
    cand_idx[:, 1] = 60000
    cand_idx[:, 2] = 90000
    cand_best = cand_idx.copy()
    key_val = np.full((64, s), 12.0, dtype=np.float32)
    key_idx = np.tile(np.array([30000] * s, dtype=np.int32), (64, 1))

    rows = 0
    now_ms = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        j = rows % 64
        keys = tracker.current_keys(s)
        tracker.process_compact(
            cand_idx[j], cand_val[j], cand_best[j], 3, keys, key_val[j], key_idx[j],
            now_ms,
        )
        now_ms += 20
        rows += 1
    dt = time.perf_counter() - t0
    rate = rows / dt
    return {
        "metric": "tracker_rows_per_second_per_band",
        "value": round(rate, 1),
        "unit": "rows/s",
        "vs_baseline": round(rate / 50.0, 2),  # reference cadence: 50 rows/s/band
    }


def bench_runtime(seconds: float, rate: int) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

    tmp = tempfile.mkdtemp(prefix="bench_runtime_")
    cap = os.path.join(tmp, "cap.cs8")
    rng = np.random.default_rng(0)
    n = rate  # 1 s of IQ, looped
    raw = rng.integers(-32, 32, size=2 * n, dtype=np.int8)
    raw.tofile(cap)

    center = 145_000_000
    raw_cfg = default_config_json()
    raw_cfg["tunables"] = {
        "pipelined_ingest": True,
        "int8_ingest": True,
        "frames_per_block": 20,
    }
    raw_cfg["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw_cfg["devices"] = [
        {
            "enabled": True,
            "serial": "bench",
            "driver": "replay",
            "sample_rate": rate,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": center - rate // 2, "stop": center + rate // 2}],
            "file": cap,
            "file_format": "cs8",
        }
    ]
    cfg_path = os.path.join(tmp, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(raw_cfg, f)
    cfg = Config.load_from_file(cfg_path, scan_hardware=False)

    scanner = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=2, loop_replay=True)
    block = scanner.device.scan_cfg.block_samples
    # warmup (compile)
    for _ in range(3):
        scanner.step()
    t0 = time.perf_counter()
    blocks = 0
    while time.perf_counter() - t0 < seconds:
        scanner.step()
        blocks += 1
    dt = time.perf_counter() - t0
    sps = blocks * block / dt
    return {
        "metric": "runtime_end_to_end_samples_per_second",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / 20_480_000.0, 2),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=8.0)
    parser.add_argument("--rate", type=int, default=20_480_000)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tracker-only", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    print(json.dumps(bench_tracker(args.seconds / 2)))
    if not args.tracker_only:
        print(json.dumps(bench_runtime(args.seconds, args.rate)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
