"""Two-device application run + debug-tap -> converter.py round trip.

Covers the reference's multi-device lifecycle (one Scanner per enabled
device, main.cpp:50-63) and the debug-dump analysis workflow
(DEBUG_SAVE_RECORDING_RAW_IQ tap -> converter.py spectrogram/gqrx,
recorder.cpp:42-45 + scripts/converter.py).
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

from rtl_sdr_scanner_tpu.runtime import main as main_mod
from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTERS = (145_000_000, 435_000_000)
SHIFTS = (30_000, -40_000)
TONES = (800, 1300)


def _capture(tmp_path, name, shift, tone, seconds=8.0):
    rng = np.random.default_rng(hash(name) % 2**32)
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * tone * t)
    phase = 2 * np.pi * shift * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 3.0) & (t < 6.0))
    path = tmp_path / f"{name}.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


def _device(serial, center, capture):
    return {
        "enabled": True,
        "serial": serial,
        "driver": "replay",
        "sample_rate": RATE,
        "start_recording_level": 8,
        "stop_recording_level": 5,
        "gains": [],
        "ranges": [{"start": center - 100000, "stop": center + 100000}],
        "file": str(capture),
        "file_format": "cf32",
    }


def test_two_devices_scan_concurrently(tmp_path, monkeypatch):
    """main.run drives BOTH enabled devices; each emits its own topics."""
    caps = [
        _capture(tmp_path, f"dev{i}", SHIFTS[i], TONES[i], seconds=6.0)
        for i in range(2)
    ]
    raw = default_config_json()
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [_device(f"r{i}", CENTERS[i], caps[i]) for i in range(2)]
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(raw))

    mqtts = []

    def fake_make_mqtt(config):
        m = NullMqtt()
        m.keep_payloads = True
        mqtts.append(m)
        return m

    monkeypatch.setattr(main_mod, "make_mqtt", fake_make_mqtt)
    main_mod._is_running = True
    result = {}
    t = threading.Thread(target=lambda: result.setdefault("rc", main_mod.run(str(cfg_path))))
    t.start()
    try:
        deadline = time.time() + 240
        want = {f"sdr/replay_r{i}/transmission/uint8" for i in range(2)}
        while time.time() < deadline:
            if mqtts and want <= {t_ for t_, _ in mqtts[0].published}:
                break
            time.sleep(0.2)
    finally:
        main_mod._is_running = False
        t.join(timeout=120)
    assert result.get("rc") == 0
    topics = {t_ for t_, _ in mqtts[0].published}
    assert want <= topics, topics
    # each device's recording centers on its own transmission
    for i in range(2):
        payloads = [
            decode_transmission(p)
            for t_, p in mqtts[0].published
            if t_ == f"sdr/replay_r{i}/transmission/uint8"
        ]
        centers = {(s0 + s1) // 2 for _, s0, s1, _, _ in payloads}
        assert any(abs(c - (CENTERS[i] + SHIFTS[i])) <= 2500 for c in centers), (
            i,
            centers,
        )


def test_debug_tap_converter_roundtrip(tmp_path, monkeypatch):
    """debug_save_recording_raw_iq dumps recordings as cs8 .raw files that
    converter.py renders to a spectrogram JPG and exports to gqrx."""
    monkeypatch.chdir(tmp_path)  # FileSink writes to ./
    cap = _capture(tmp_path, "tap", SHIFTS[0], TONES[0], seconds=6.0)
    raw = default_config_json()
    raw["tunables"] = {"debug_save_recording_raw_iq": True}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [_device("tap0", CENTERS[0], cap)]
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    scanner = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=2)
    scanner.run_to_completion()
    for sink in scanner.device._rec_sinks or []:
        sink.stop()

    dumps = [f for f in os.listdir(tmp_path) if f.startswith("recording_") and f.endswith(".raw")]
    assert dumps, list(os.listdir(tmp_path))
    dump = dumps[0]
    # filename carries frequency + rate (radio_utils.cpp:78-84 convention)
    fields = dump.split("_")
    assert int(fields[4]) == 16000  # recording sample rate

    converter = os.path.join(os.path.dirname(__file__), "..", "scripts", "converter.py")
    out = subprocess.run(
        [sys.executable, converter, "--spectrogram", "--gqrx", "-f", "256", dump],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    stem = os.path.splitext(dump)[0]
    assert (tmp_path / f"{stem}.jpg").exists()
