"""Manual recording end-to-end (extension over the reference's
sdr/manual_recording stub, remote_controller.cpp:45).

A noise-only capture produces no detections; a manual recording request must
still force a recorder slot at the requested frequency for the requested
stream duration and emit bit-valid transmission payloads.
"""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000
MANUAL_FREQ = CENTER + 30_000


def _config(tmp_path, capture):
    raw = default_config_json()
    raw["tunables"] = {"compact_detection": True}
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
            "ranges": [{"start": CENTER - 100000, "stop": CENTER + 100000}],
            "file": str(capture),
            "file_format": "cf32",
        }
    ]
    raw["workers"] = 2
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))
    return Config.load_from_file(str(path), scan_hardware=False)


def test_manual_recording_records_requested_band(tmp_path):
    capture = tmp_path / "noise.cf32"
    rng = np.random.default_rng(5)
    n = int(RATE * 6)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    # a weak tone at the manual frequency, far below start_recording_level
    iq += 0.02 * np.exp(2j * np.pi * (MANUAL_FREQ - CENTER) * t)
    iq.astype(np.complex64).view(np.float32).tofile(capture)
    cfg = _config(tmp_path, capture)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)

    assert not scanner.manual_record(CENTER + 10_000_000, 1000)  # out of range
    assert scanner.manual_record(MANUAL_FREQ, 2000)
    scanner.run_to_completion()

    trans = [p for topic, p in mqtt.published if topic.endswith("/transmission/uint8")]
    assert trans, "manual recording emitted no transmission payloads"

    total = 0
    for p in trans:
        _t0, start, stop, rate, iq_rec = decode_transmission(p)
        assert rate == 16000
        assert abs((start + stop) // 2 - MANUAL_FREQ) <= 2500
        total += len(iq_rec)
    # ~2 s of stream time at 16 kHz, allow one block of slack each way
    assert 16000 <= total <= 3 * 16000 + 16000, total
    assert not scanner.device.has_manual_recording


def test_manual_recording_expires(tmp_path):
    capture = tmp_path / "noise2.cf32"
    rng = np.random.default_rng(6)
    n = int(RATE * 6)
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq.astype(np.complex64).view(np.float32).tofile(capture)
    cfg = _config(tmp_path, capture)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    assert scanner.manual_record(MANUAL_FREQ, 1500)
    scanner.run_to_completion()

    # after expiry no recorder slot stays live
    assert not scanner.device.is_recording
    assert not scanner.device.has_manual_recording
    trans = [p for topic, p in mqtt.published if topic.endswith("/transmission/uint8")]
    assert trans  # noise gets recorded too -- the user asked for the band
