"""WidebandScanner session-feature parity (round-2 verdict weak #6).

The single-band Scanner already had noise snapshot save/load, int8 ingest,
pipelined ingest, and (now) a final spectrogram flush; wideband sessions must
match: per-channel noise snapshots on stop, cs8 wideband captures ingested as
int8 with in-jit dequant, the device spectrogram accumulator drained on stop
(no lost final partial second), and optional pipelined mesh ingest.
"""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

RATE = 1_024_000
B = 4
CENTER = 145_000_000


def _write_capture(tmp_path, fmt, secs=8.0, signals=((300_000, 800), (-300_000, 1300))):
    rng = np.random.default_rng(9)
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    keyed = (t >= 3.0) & (t < 6.0)
    for f, tone in signals:
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * f * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        iq += 0.4 * np.exp(1j * phase) * keyed
    path = tmp_path / f"wide.{fmt}"
    if fmt == "cf32":
        iq.astype(np.complex64).view(np.float32).tofile(path)
    else:  # cs8
        flat = iq.astype(np.complex64).view(np.float32)
        np.clip(np.round(flat * 127.0), -128, 127).astype(np.int8).tofile(path)
    return path


def _config(tmp_path, capture, fmt, tunables, tag):
    raw = default_config_json()
    raw["tunables"] = tunables
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "widelc",
            "driver": "replay",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": CENTER - RATE // 2, "stop": CENTER + RATE // 2}],
            "file": str(capture),
            "file_format": fmt,
            "channels": B,
        }
    ]
    p = tmp_path / f"cfg_{tag}.json"
    p.write_text(json.dumps(raw))
    return Config.load_from_file(str(p), scan_hardware=False)


def test_noise_snapshot_and_final_spectro_flush(tmp_path):
    capture = _write_capture(tmp_path, "cf32", secs=2.6, signals=())
    noise_base = str(tmp_path / "noise")
    cfg = _config(
        tmp_path, capture, "cf32", {"noise_state_path": noise_base}, "lc"
    )
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=4)
    scanner.run_to_completion()
    before = len([1 for t, _ in mqtt.published if t.endswith("/spectrogram")])
    scanner.stop()
    after = len([1 for t, _ in mqtt.published if t.endswith("/spectrogram")])
    # the final partial send-interval is flushed on stop, one per band
    assert after == before + B, (before, after)

    # per-channel noise snapshots written (2.6 s > the 2 s learning window)
    import os

    name = cfg.devices[0].name
    for ch in range(B):
        assert os.path.exists(f"{noise_base}.{name}.ch{ch}.npz"), ch

    # a fresh scanner resumes with ready noise floors (no relearning)
    scanner2 = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=4)
    for session in scanner2.sessions:
        noise = session._noise_states.get(session.center_frequency)
        assert noise is not None and bool(noise.ready), session.center_frequency


def test_int8_wideband_ingest_matches_cf32_path(tmp_path):
    """A cs8 wideband capture ingested as raw int8 (in-jit dequant at 1/127.5)
    must produce byte-identical payloads to the host-dequant f32 path."""
    capture = _write_capture(tmp_path, "cs8")

    def run(int8_ingest):
        cfg = _config(
            tmp_path, capture, "cs8", {"int8_ingest": int8_ingest}, f"i8_{int8_ingest}"
        )
        mqtt = NullMqtt()
        mqtt.keep_payloads = True
        scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=4)
        scanner.run_to_completion()
        return mqtt.published

    with_int8 = run(True)
    without = run(False)
    t_a = [(t, p) for t, p in with_int8 if t.endswith("/transmission/uint8")]
    t_b = [(t, p) for t, p in without if t.endswith("/transmission/uint8")]
    assert t_a, "no transmissions detected"
    assert t_a == t_b, "int8 wideband ingest diverged from the f32 path"


def test_pipelined_mesh_ingest_matches(tmp_path):
    """tunables.pipelined_ingest keeps one wideband block in flight on the
    mesh; payloads must match the unpipelined mesh run on an isolated-signal
    scene (key slots sampled one block earlier fall back to the candidate
    update path, exact for isolated signals -- ops/detect.py contract)."""
    capture = _write_capture(tmp_path, "cf32")

    def run(pipelined):
        cfg = _config(
            tmp_path,
            capture,
            "cf32",
            {"mesh_bands": B, "pipelined_ingest": pipelined},
            f"pl_{pipelined}",
        )
        mqtt = NullMqtt()
        mqtt.keep_payloads = True
        scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=4)
        assert scanner._mesh is not None
        scanner.run_to_completion()
        scanner.stop()
        return mqtt.published

    plain = run(False)
    piped = run(True)
    t_a = [(t, p) for t, p in plain if t.endswith("/transmission/uint8")]
    t_b = [(t, p) for t, p in piped if t.endswith("/transmission/uint8")]
    assert t_a, "no transmissions detected"
    assert t_a == t_b, "pipelined mesh ingest diverged"


def test_single_band_scanner_final_spectro_flush(tmp_path):
    """Scanner.stop() must flush the last partial send-interval of waterfall
    data too (same guarantee the wideband path has)."""
    from rtl_sdr_scanner_tpu.runtime.config import Config
    from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

    rate = 256000
    rng = np.random.default_rng(3)
    n = int(rate * 0.8)  # shorter than the 1 s spectrogram send interval
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    capture = tmp_path / "short.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(capture)

    raw = default_config_json()
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "short0",
            "driver": "replay",
            "sample_rate": rate,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": CENTER - 100000, "stop": CENTER + 100000}],
            "file": str(capture),
            "file_format": "cf32",
        }
    ]
    p = tmp_path / "cfg_short.json"
    p.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(p), scan_hardware=False)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    scanner.run_to_completion()
    assert not any(t.endswith("/spectrogram") for t, _ in mqtt.published)
    scanner.stop()
    assert any(t.endswith("/spectrogram") for t, _ in mqtt.published)


def test_wideband_thread_failure_sets_flag(tmp_path, monkeypatch):
    """A fatal error inside the wideband worker surfaces as .failed (main
    exits on it; reference exit(1) parity) instead of a silent dead thread."""
    import time

    import numpy as np

    from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

    rate, b = 8 * 64000, 8
    n = int(rate * 1.0)
    rng = np.random.default_rng(0)
    iq = 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    cap = tmp_path / "w.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(cap)

    raw = default_config_json()
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True, "serial": "wfail", "driver": "replay",
            "sample_rate": rate, "start_recording_level": 8,
            "stop_recording_level": 5, "gains": [],
            "ranges": [{"start": 145_000_000 - rate // 2,
                        "stop": 145_000_000 + rate // 2}],
            "file": str(cap), "file_format": "cf32", "channels": b,
        }
    ]
    p = tmp_path / "c.json"
    import json

    p.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(p), scan_hardware=False)
    s = WidebandScanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=b)

    def boom():
        raise RuntimeError("injected fatal pipeline error")

    s.step = boom
    s.start()
    deadline = time.time() + 10
    while not s.failed and time.time() < deadline:
        time.sleep(0.05)
    assert s.failed
    s.stop()
