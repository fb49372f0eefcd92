"""BASELINE.json config 3: two concurrent transmissions in ONE band, each
assigned its own recorder slot and recovered independently."""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000
F1, TONE1 = 30_000, 800
F2, TONE2 = -60_000, 1300


def _capture(tmp_path):
    rng = np.random.default_rng(21)
    n = int(RATE * 9)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    for f, tone, t_on, t_off in ((F1, TONE1, 3.0, 7.0), (F2, TONE2, 3.5, 6.5)):
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * f * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        iq += 0.4 * np.exp(1j * phase) * ((t >= t_on) & (t < t_off))
    path = tmp_path / "two.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


@pytest.mark.parametrize("compact", [False, True], ids=["full", "compact"])
def test_two_concurrent_recordings_one_band(tmp_path, compact):
    capture = _capture(tmp_path)
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
            "ranges": [{"start": CENTER - 100000, "stop": CENTER + 100000}],
            "file": str(capture),
            "file_format": "cf32",
        }
    ]
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(path), scan_hardware=False)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=3)
    scanner.run_to_completion()

    trans = [decode_transmission(p) for t, p in mqtt.published if t.endswith("uint8")]
    assert trans
    by_center = {}
    for _, s0, s1, _, iq in trans:
        by_center.setdefault((s0 + s1) // 2, []).append(iq)

    for f_expect, tone in ((F1, TONE1), (F2, TONE2)):
        match = [c for c in by_center if abs(c - (CENTER + f_expect)) <= 2500]
        assert match, (f_expect, sorted(by_center))
        z = np.concatenate(by_center[match[0]])
        z = z[:, 0].astype(np.float32) + 1j * z[:, 1].astype(np.float32)
        z = z[len(z) // 3 :]
        d = np.angle(z[1:] * np.conj(z[:-1]))
        sp = np.abs(np.fft.rfft(d - d.mean()))
        f_audio = np.argmax(sp) / len(d) * 16000
        assert abs(f_audio - tone) < 50, (f_expect, f_audio)
