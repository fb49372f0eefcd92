"""End-to-end: the BASELINE.json config-1 slice.

Scan a replayed FM-band capture (synthetic NFM transmission keyed mid-file)
through the full runtime -- Scanner -> SdrDevice -> jitted pipelines ->
TransmissionTracker -> recorder slots -> DataController/NullMqtt -- and check
the emitted transmission + spectrogram payloads.
"""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import (
    decode_spectrogram,
    decode_transmission,
)
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000
SHIFT = 30_000


def _write_capture(path, seconds=10.0, key_from=3.0, key_to=7.0):
    rng = np.random.default_rng(9)
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 800 * t)
    phase = 2 * np.pi * SHIFT * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= key_from) & (t < key_to))
    iq.astype(np.complex64).view(np.float32).tofile(path)


def _config(tmp_path, capture, compact=True):
    raw = default_config_json()
    raw["tunables"] = {"compact_detection": compact}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "replay0",
            "driver": "replay",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            # keep the range within get_range_split_sample_rate(256000)=200kHz
            # so this is a single park-forever hop (scanner.cpp:40-44)
            "ranges": [{"start": CENTER - 100000, "stop": CENTER + 100000}],
            "file": str(capture),
            "file_format": "cf32",
        }
    ]
    raw["workers"] = 2
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))
    return Config.load_from_file(str(path), scan_hardware=False)


@pytest.mark.parametrize("compact", [False, True], ids=["full", "compact"])
def test_replay_scan_end_to_end(tmp_path, compact):
    capture = tmp_path / "fm.cf32"
    _write_capture(capture)
    cfg = _config(tmp_path, capture, compact=compact)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    scanner.run_to_completion()

    trans = [p for t, p in mqtt.published if t.endswith("/transmission/uint8")]
    spectro = [p for t, p in mqtt.published if t.endswith("/spectrogram")]
    assert trans, "no transmission payloads emitted"
    assert spectro, "no spectrogram payloads emitted"

    # transmission payload sanity: the dominant recorded band is centered on
    # the transmission (the reference may track a second overlapping signal
    # when the history vote seeds a key inside another's margin; dedup only
    # applies to candidate indices -- transmission.cpp:97-110)
    by_center = {}
    for p in trans:
        t0, start, stop, rate, iq = decode_transmission(p)
        assert rate == 16000
        by_center.setdefault((start + stop) // 2, []).append(iq)
    main_center = max(by_center, key=lambda c: sum(len(x) for x in by_center[c]))
    assert abs(main_center - (CENTER + SHIFT)) <= 2500, by_center.keys()
    total = sum(len(x) for x in by_center[main_center])
    assert total > 2.0 * 16000, total  # at least a couple seconds recorded

    # the recording should FM-demodulate back to the 800 Hz tone
    all_iq = np.concatenate(by_center[main_center])
    z = all_iq[:, 0].astype(np.float32) + 1j * all_iq[:, 1].astype(np.float32)
    z = z[len(z) // 4 :]
    d = np.angle(z[1:] * np.conj(z[:-1]))
    sp = np.abs(np.fft.rfft(d - d.mean()))
    f_audio = np.argmax(sp) / len(d) * 16000
    assert abs(f_audio - 800) < 40, f_audio

    # spectrogram payload sanity
    t0, start, stop, step, bins = decode_spectrogram(spectro[0])
    assert (start, stop) == (CENTER - RATE // 2, CENTER + RATE // 2)
    assert len(bins) == scanner.device.scan_cfg.spectro_size
    assert step == RATE // len(bins)
    # dB values should look like PSD floor (negative)
    assert np.median(bins) < 0


def test_replay_scan_no_signal_no_transmissions(tmp_path):
    capture = tmp_path / "noise.cf32"
    rng = np.random.default_rng(2)
    n = int(RATE * 5)
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq.astype(np.complex64).view(np.float32).tofile(capture)
    cfg = _config(tmp_path, capture)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    scanner.run_to_completion()

    trans = [p for t, p in mqtt.published if t.endswith("/transmission/uint8")]
    spectro = [p for t, p in mqtt.published if t.endswith("/spectrogram")]
    assert trans == []
    assert spectro, "spectrogram should flow regardless of detections"


def test_compact_vs_full_spectrogram_parity(tmp_path):
    """ADVICE r1: compact mode accumulates spectrogram bin sums in f32 ON
    DEVICE across the 1 Hz send interval (scan_pipeline spectro_acc) while
    full-row mode accumulates f64 on host -- the truncating int8 quantization
    may then differ by 1 at trunc boundaries. Assert the payload streams
    match within that documented bound."""
    capture = tmp_path / "fm.cf32"
    _write_capture(capture)

    payloads = {}
    for compact in (False, True):
        cfg = _config(tmp_path, capture, compact=compact)
        mqtt = NullMqtt()
        mqtt.keep_payloads = True
        Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2).run_to_completion()
        payloads[compact] = [
            decode_spectrogram(p) for t, p in mqtt.published if t.endswith("/spectrogram")
        ]

    assert len(payloads[True]) == len(payloads[False]) > 0
    for (tc, c0, c1, cs, cb), (tf, f0, f1, fs, fb) in zip(payloads[True], payloads[False]):
        assert (tc, c0, c1, cs) == (tf, f0, f1, fs)
        diff = np.abs(cb.astype(np.int32) - fb.astype(np.int32))
        assert diff.max() <= 1, diff.max()
