"""bf16 detection tolerance mode (tunables.detection_bf16).

Contract (ops/detect.py compact_detection docstring): selection sweeps read
bf16 row copies; every reported VALUE is exact f32 (re-gathered at the
selected bins); detection DECISIONS match f32 compact mode on realistic
scenes because start/stop margins are multi-dB while bf16 epsilon is ~0.03 dB
at the default level. full-row f32 and compact f32 remain the exact parity
ladder -- this mode buys bandwidth (BENCH.md roofline) at a bounded,
documented tolerance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.constants import Tunables
from rtl_sdr_scanner_tpu.models.scan_pipeline import (
    ScanConfig,
    init_scan_state,
    init_spectro_acc,
    make_compact_scan_step,
)
from rtl_sdr_scanner_tpu.ops.detect import compact_detection
from rtl_sdr_scanner_tpu.runtime.transmission_tracker import TransmissionTracker

RATE = 256000
CENTER = 145_000_000
GROUP = 64
TOP_K = 32
KEY_SLOTS = 8


def test_bf16_values_are_exact_f32():
    """cand_val must equal the f32 row at cand_idx bit-for-bit (the re-gather
    guarantee: only selection runs in bf16, never the reported powers)."""
    rng = np.random.default_rng(2)
    f, fft = 4, 4096
    avg = (rng.standard_normal((f, fft)) * 10).astype(np.float32)
    raw = avg.copy()
    prev = np.zeros((10, fft), dtype=np.float32)
    keys = np.full(KEY_SLOTS, -1, dtype=np.int32)
    valid = np.ones(fft, dtype=bool)
    out = compact_detection(
        jnp.asarray(avg), jnp.asarray(raw), jnp.asarray(prev), jnp.asarray(keys),
        jnp.asarray(valid), jnp.float32(8.0), GROUP, TOP_K, bf16=True,
    )
    ci, cv = np.asarray(out.cand_idx), np.asarray(out.cand_val)
    assert cv.dtype == np.float32
    for k in range(f):
        np.testing.assert_array_equal(cv[k], avg[k, ci[k]])


def _make_iq(rng, signals):
    seconds = 8.0
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    for shift, tone, key_from, key_to in signals:
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * shift * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        amp = 0.2 + 0.4 * rng.random()
        iq += amp * np.exp(1j * phase) * ((t >= key_from) & (t < key_to))
    return iq.astype(np.complex64)


def _make_tracker(cfg):
    return TransmissionTracker(
        fft_size=cfg.fft_size,
        group_size=GROUP,
        start_level=8.0,
        stop_level=5.0,
        recording_min_time_ms=500,
        recording_timeout_ms=500,
        tuning_step=2500,
        index_to_shift=cfg.index_to_shift,
        index_to_frequency=lambda i: cfg.index_to_frequency(i, CENTER),
        is_index_in_range=lambda i: True,
    )


def _run_compact(iq, cfg):
    group = cfg.fft_size * cfg.decimator_factor
    n_blocks = len(iq) // cfg.block_samples
    frame_ms = cfg.frame_interval_ms
    step = make_compact_scan_step(cfg, GROUP, TOP_K)
    tracker = _make_tracker(cfg)
    state = init_scan_state(cfg)
    sp_acc = init_spectro_acc(cfg)
    valid = jnp.asarray(np.ones(cfg.fft_size, dtype=bool))
    log = []
    for b in range(n_blocks):
        block = iq[b * cfg.block_samples : (b + 1) * cfg.block_samples]
        framed = jnp.asarray(block.reshape(cfg.frames_per_block, group))
        now = (
            (b * cfg.frames_per_block + 1 + np.arange(cfg.frames_per_block)) * frame_ms
        ).astype(np.int32)
        slot_keys = tracker.current_keys(KEY_SLOTS)
        state, sp_acc, oc = step(
            state, sp_acc, framed, jnp.asarray(now), jnp.asarray(slot_keys), valid,
            jnp.float32(8.0), jnp.float32(1.0),
        )
        c = oc.compact
        ci, cv = np.asarray(c.cand_idx), np.asarray(c.cand_val)
        cb, cc = np.asarray(c.cand_best), np.asarray(c.cand_count)
        kv, ki = np.asarray(c.key_val), np.asarray(c.key_idx)
        for k in range(cfg.frames_per_block):
            log.append(
                (
                    int(now[k]),
                    sorted(
                        tracker.process_compact(
                            ci[k], cv[k], cb[k], int(cc[k]), slot_keys, kv[k], ki[k],
                            int(now[k]),
                        )
                    ),
                )
            )
    return log


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_bf16_decisions_match_f32_compact(seed):
    """Identical DETECTION DECISIONS -- same (shift, flush) timeline, every
    frame -- between bf16 tolerance mode and f32 compact mode on randomized
    multi-signal FM scenes (signal margins are multi-dB >> bf16 epsilon)."""
    rng = np.random.default_rng(seed)
    signals = []
    for _ in range(3):
        signals.append(
            (
                int(rng.integers(-100_000, 100_000)),
                int(rng.integers(300, 2000)),
                float(rng.uniform(2.5, 4.5)),
                float(rng.uniform(5.0, 7.0)),
            )
        )
    iq = _make_iq(np.random.default_rng(seed + 100), signals)

    cfg_f32 = ScanConfig.create(RATE, frames_per_block=10)
    cfg_bf16 = dataclasses.replace(cfg_f32, detection_bf16=True)
    log_f32 = _run_compact(iq, cfg_f32)
    log_bf16 = _run_compact(iq, cfg_bf16)
    assert any(tr for _, tr in log_f32), "scene produced no detections"
    assert log_bf16 == log_f32, "bf16 tolerance mode changed detection decisions"


def test_bf16_from_tunables():
    cfg = ScanConfig.create(RATE, tunables=Tunables(detection_bf16=True))
    assert cfg.detection_bf16
