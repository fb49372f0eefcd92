"""Noise-floor snapshot/resume: a restarted scanner skips relearning."""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000


def _config(tmp_path, capture, noise_path):
    raw = default_config_json()
    raw["tunables"] = {"noise_state_path": str(noise_path)}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 500,
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
    return Config.load_from_file(str(path), scan_hardware=False)


def _capture_with_tone_from_start(path, seconds=3.0):
    rng = np.random.default_rng(5)
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 700 * t)
    phase = 2 * np.pi * 30000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase)  # keyed from t=0
    iq.astype(np.complex64).view(np.float32).tofile(path)


def test_noise_snapshot_resume(tmp_path):
    noise_path = tmp_path / "noise"
    # session 1: pure noise -> learns the floor, saves on stop
    noise_cap = tmp_path / "noise.cf32"
    rng = np.random.default_rng(0)
    n = int(RATE * 3)
    (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    ).view(np.float32).tofile(noise_cap)
    cfg = _config(tmp_path, noise_cap, noise_path)
    s1 = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=1)
    s1.run_to_completion()
    s1.stop()
    import os

    saved = f"{noise_path}.replay_replay0.npz"
    assert os.path.exists(saved)

    # session 2: transmission keyed from t=0. Without resume the learner
    # would bake the carrier into the floor and miss it; with resume it
    # detects immediately.
    tone_cap = tmp_path / "tone.cf32"
    _capture_with_tone_from_start(tone_cap)
    cfg2 = _config(tmp_path, tone_cap, noise_path)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    s2 = Scanner(cfg2, cfg2.devices[0], mqtt, recorders_count=1)
    s2.run_to_completion()
    trans = [p for t, p in mqtt.published if t.endswith("/transmission/uint8")]
    assert trans, "resumed noise floor should detect the always-on transmission"
