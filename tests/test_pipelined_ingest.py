"""Pipelined ingest produces the same detections as the synchronous path."""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000


def _capture(tmp_path):
    rng = np.random.default_rng(9)
    n = int(RATE * 8)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 800 * t)
    phase = 2 * np.pi * 30000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 3) & (t < 6))
    path = tmp_path / "x.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


def _config(tmp_path, capture, pipelined):
    raw = default_config_json()
    raw["tunables"] = {"pipelined_ingest": pipelined}
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
    path = tmp_path / f"config_{pipelined}.json"
    path.write_text(json.dumps(raw))
    return Config.load_from_file(str(path), scan_hardware=False)


def _run(tmp_path, capture, pipelined):
    cfg = _config(tmp_path, capture, pipelined)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    scanner.run_to_completion()
    return [
        decode_transmission(p)
        for t, p in mqtt.published
        if t.endswith("/transmission/uint8")
    ]


def test_pipelined_matches_sync(tmp_path):
    capture = _capture(tmp_path)
    sync = _run(tmp_path, capture, pipelined=False)
    piped = _run(tmp_path, capture, pipelined=True)
    assert sync and piped
    # same recorded band and essentially the same sample volume (single-range
    # scan: no hop-timing effects, so payload streams should match)
    assert sync[0][1:4] == piped[0][1:4]  # start, stop, rate
    total_s = sum(x[4].shape[0] for x in sync)
    total_p = sum(x[4].shape[0] for x in piped)
    assert abs(total_s - total_p) <= max(total_s, total_p) * 0.1, (total_s, total_p)
    np.testing.assert_array_equal(sync[0][4][:100], piped[0][4][:100])
