"""ignored_frequencies config: a transmission inside an ignored range is
never detected or recorded (reference transmission.cpp:156-164)."""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000
SHIFT = 30_000


def _capture(tmp_path):
    rng = np.random.default_rng(4)
    n = int(RATE * 7)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 700 * t)
    phase = 2 * np.pi * SHIFT * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * (t >= 3)
    path = tmp_path / "x.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


@pytest.mark.parametrize("compact", [False, True], ids=["full", "compact"])
def test_ignored_range_suppresses_detection(tmp_path, compact):
    capture = _capture(tmp_path)
    raw = default_config_json()
    raw["tunables"] = {"compact_detection": compact}
    raw["ignored_frequencies"] = [
        {"frequency": CENTER + SHIFT, "bandwidth": 40000}
    ]
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
    path = tmp_path / "c.json"
    path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(path), scan_hardware=False)
    assert cfg.ignored_ranges == [(CENTER + SHIFT - 20000, CENTER + SHIFT + 20000)]

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    scanner.run_to_completion()
    trans = [p for t, p in mqtt.published if t.endswith("uint8")]
    assert trans == [], "ignored transmission must not be recorded"
