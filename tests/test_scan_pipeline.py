"""Integration: fused scan pipeline + host transmission tracker detect a keyed
NFM transmission on synthetic IQ, emit flush lists, and clear on key-down."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.constants import NO_DATA
from rtl_sdr_scanner_tpu.models.scan_pipeline import (
    ScanConfig,
    init_scan_state,
    make_scan_step,
)
from rtl_sdr_scanner_tpu.runtime.transmission_tracker import TransmissionTracker

RATE = 256000
CENTER = 145_000_000
SHIFT_HZ = 30_000


def _make_iq(seconds, key_from_s, key_to_s, rng):
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 800 * t)
    phase = 2 * np.pi * SHIFT_HZ * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    keyed = (t >= key_from_s) & (t < key_to_s)
    iq += 0.4 * np.exp(1j * phase) * keyed
    return iq.astype(np.complex64)


def _run(iq, cfg, tracker):
    step_fn = make_scan_step(cfg)
    state = init_scan_state(cfg, start_ms=0)
    group = cfg.fft_size * cfg.decimator_factor
    n_blocks = len(iq) // cfg.block_samples
    frame_ms = cfg.frame_interval_ms
    notifications = []
    for b in range(n_blocks):
        block = iq[b * cfg.block_samples : (b + 1) * cfg.block_samples]
        framed = jnp.asarray(block.reshape(cfg.frames_per_block, group))
        f0 = b * cfg.frames_per_block
        now = jnp.asarray(
            ((f0 + 1 + np.arange(cfg.frames_per_block)) * frame_ms).astype(np.int32)
        )
        state, outs = step_fn(state, framed, now)
        raw = np.asarray(outs.raw)
        avg = np.asarray(outs.avg)
        for k in range(cfg.frames_per_block):
            notifications.append(
                (int(now[k]), tracker.process(raw[k], avg[k], int(now[k])))
            )
    return notifications


def _make_tracker(cfg):
    group_size = int(np.ceil(16000 / cfg.step_hz))  # recording bandwidth in bins
    return TransmissionTracker(
        fft_size=cfg.fft_size,
        group_size=group_size,
        start_level=8.0,
        stop_level=5.0,
        recording_min_time_ms=500,
        recording_timeout_ms=500,
        tuning_step=2500,
        index_to_shift=cfg.index_to_shift,
        index_to_frequency=lambda i: cfg.index_to_frequency(i, CENTER),
        is_index_in_range=lambda i: True,
    )


def test_detect_record_clear_cycle():
    cfg = ScanConfig.create(RATE, frames_per_block=10)
    assert cfg.fft_size == 1024 and cfg.decimator_factor == 5
    rng = np.random.default_rng(3)
    iq = _make_iq(seconds=8.0, key_from_s=3.0, key_to_s=6.0, rng=rng)
    tracker = _make_tracker(cfg)
    notifications = _run(iq, cfg, tracker)

    # before key-up (while learning + idle): no transmissions
    for now, trans in notifications:
        if now < 3000:
            assert trans == [], (now, trans)

    # transmission appears shortly after key-up
    detect_times = [now for now, tr in notifications if tr]
    assert detect_times, "never detected"
    first = min(detect_times)
    assert 3000 < first < 4000, first

    # detected shift snaps to the 2500 Hz grid near +30 kHz
    shifts = {s for now, tr in notifications for s, _ in tr}
    assert any(abs(s - SHIFT_HZ) <= 2500 for s in shifts), shifts

    # flush begins only after recording_min_time (500 ms after detection)
    flush_times = [now for now, tr in notifications if any(f for _, f in tr)]
    assert flush_times and min(flush_times) >= first + 500

    # after key-down + timeout the signal clears
    last = max(detect_times)
    assert last < 6000 + 1500, last
    assert tracker.active_count == 0


def test_no_false_positives_on_noise():
    cfg = ScanConfig.create(RATE, frames_per_block=10)
    rng = np.random.default_rng(11)
    iq = (0.01 * (rng.standard_normal(RATE * 5) + 1j * rng.standard_normal(RATE * 5))).astype(
        np.complex64
    )
    tracker = _make_tracker(cfg)
    notifications = _run(iq, cfg, tracker)
    assert all(tr == [] for _, tr in notifications)


def test_sentinel_rows_while_learning():
    cfg = ScanConfig.create(RATE, frames_per_block=10)
    step_fn = make_scan_step(cfg)
    state = init_scan_state(cfg, start_ms=0)
    rng = np.random.default_rng(5)
    block = (rng.standard_normal((10, cfg.fft_size * cfg.decimator_factor, 2)) * 20).astype(
        np.int8
    )
    now = jnp.asarray(np.arange(1, 11, dtype=np.int32) * 100)  # all < 2000 ms
    state, outs = step_fn(state, jnp.asarray(block), now)
    assert not bool(outs.noise_ready)
    np.testing.assert_array_equal(np.asarray(outs.raw), NO_DATA)
