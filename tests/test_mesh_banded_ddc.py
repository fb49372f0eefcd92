"""Banded recording in the app mesh path (round-2 verdict item 1).

WidebandScanner mesh mode must run recording as ONE sharded DDC dispatch over
the bands axis (parallel/sharded_scan.make_sharded_banded_ddc) -- not B serial
per-band dispatches -- while staying byte-identical to the serial per-session
path with MANY bands recording simultaneously (the reference's recorder pool
runs its chains concurrently off one source, sdr_device.cpp:39-41,
recorder.cpp:21-40).
"""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

RATE = 2_048_000
B = 8
CENTER = 145_000_000
# five signals in five distinct sub-band cores (core width 256 kHz), all
# keyed over the same window -> >= 4 simultaneous recordings
SIGNALS = [-750_000, -250_000, 10_000, 500_000, 760_000]


def _capture(tmp_path):
    rng = np.random.default_rng(31)
    secs = 8.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    keyed = (t >= 3.0) & (t < 6.0)
    for i, f in enumerate(SIGNALS):
        audio = np.sin(2 * np.pi * (700 + 150 * i) * t)
        phase = 2 * np.pi * f * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        iq += 0.4 * np.exp(1j * phase) * keyed
    path = tmp_path / "wide5.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


def _run(tmp_path, capture, mesh_bands):
    raw = default_config_json()
    raw["tunables"] = {"mesh_bands": mesh_bands}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "wide5",
            "driver": "replay",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [],
            "ranges": [{"start": CENTER - RATE // 2, "stop": CENTER + RATE // 2}],
            "file": str(capture),
            "file_format": "cf32",
            "channels": B,
        }
    ]
    cfg_path = tmp_path / f"cfg5_{mesh_bands}.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    if mesh_bands:
        assert scanner._mesh is not None
        # the banded sharded DDC must be the active recording path
        assert scanner._ddc_band_step is not None, "banded DDC did not engage"
        assert all(s.external_ddc for s in scanner.sessions)
    scanner.run_to_completion()
    return mqtt.published


def test_many_bands_recording_banded_parity(tmp_path):
    capture = _capture(tmp_path)
    serial = _run(tmp_path, capture, mesh_bands=0)
    meshed = _run(tmp_path, capture, mesh_bands=8)

    s_trans = [(t, p) for t, p in serial if t.endswith("/transmission/uint8")]
    m_trans = [(t, p) for t, p in meshed if t.endswith("/transmission/uint8")]
    assert s_trans, "serial path produced no transmissions"
    assert len(s_trans) == len(m_trans)
    for (ts, ps), (tm, pm) in zip(s_trans, m_trans):
        assert ts == tm
        assert ps == pm, "recording payload diverged (banded mesh vs serial)"

    # all five signals recorded, each under its own sub-band
    decoded = [decode_transmission(p) for _, p in m_trans]
    centers = {(s0 + s1) // 2 for _, s0, s1, _, _ in decoded}
    for f in SIGNALS:
        # the tracked center is the detector's vote; allow a few smoothed
        # bins (250 Hz each) of slack -- byte parity above is the real bound
        assert any(abs(c - (CENTER + f)) <= 5000 for c in centers), (f, centers)

    # >= 4 bands recorded SIMULTANEOUSLY: count distinct signal centers whose
    # payload timestamps overlap in one window
    spans = {}
    for t_ms, s0, s1, _, samples in decoded:
        c = (s0 + s1) // 2
        lo, hi = spans.get(c, (t_ms, t_ms))
        spans[c] = (min(lo, t_ms), max(hi, t_ms))
    mid = 4500  # ms: the middle of the 3-6 s keyed window
    active = [c for c, (lo, hi) in spans.items() if lo <= mid <= hi + 200]
    assert len(active) >= 4, (active, spans)
