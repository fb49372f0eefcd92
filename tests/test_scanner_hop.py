"""Band-hop scheduling: dwell cadence and hold-while-recording
(reference scanner.cpp:46-60)."""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

RATE = 256000
CENTER = 145_000_000


def _config(tmp_path, capture, ranges):
    raw = default_config_json()
    raw["tunables"] = {"frames_per_block": 5}  # 100 ms blocks: fine hop granularity
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
            "ranges": [{"start": a, "stop": b} for a, b in ranges],
            "file": str(capture),
            "file_format": "cf32",
        }
    ]
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))
    return Config.load_from_file(str(path), scan_hardware=False)


def test_round_robin_dwell_and_hold(tmp_path):
    # two 200 kHz ranges -> two hops; transmission keyed 4.0-7.0 s at +30 kHz
    # relative to the capture center (the replay source serves the same data
    # for both hops; detection happens whenever the scanner sits on a hop)
    seconds = 10.0
    rng = np.random.default_rng(1)
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 600 * t)
    phase = 2 * np.pi * 30000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 4.0) & (t < 7.0))
    capture = tmp_path / "x.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(capture)

    ranges = [(CENTER - 100000, CENTER + 100000), (CENTER + 100000, CENTER + 300000)]
    cfg = _config(tmp_path, capture, ranges)
    scanner = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=2)

    hops = []
    orig = scanner.device.set_frequency_range

    def spy(rng_, now_ms):
        hops.append((now_ms, rng_))
        orig(rng_, now_ms)

    scanner.device.set_frequency_range = spy
    scanner.run_to_completion()

    assert len(hops) >= 6, hops
    # alternating ranges
    for (t0, r0), (t1, r1) in zip(hops, hops[1:]):
        assert r0 != r1, hops
    # idle dwell ~ range_scanning_time (500 ms) + noise learning on first
    # visits; hold: while the transmission is active (4-7 s) the scanner
    # stays parked -> at least one inter-hop gap of >= 2.5 s
    gaps = [t1 - t0 for (t0, _), (t1, _) in zip(hops, hops[1:])]
    assert max(gaps) >= 2500, gaps
    # steady idle dwells (post learning) are close to 500 ms
    idle = [g for g in gaps if g < 1500]
    assert idle and all(400 <= g <= 1100 for g in idle), gaps
