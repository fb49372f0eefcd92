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


def _run(tmp_path, capture, mesh_bands, extra_tunables=None):
    raw = default_config_json()
    raw["tunables"] = {"mesh_bands": mesh_bands, **(extra_tunables or {})}
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
    cfg_path = tmp_path / f"cfg5_{mesh_bands}_{len(raw['tunables'])}.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    if mesh_bands:
        assert scanner._mesh is not None
        # the banded (split or fused) sharded DDC must be the recording path
        assert scanner._fused or scanner._ddc_band_step is not None, (
            "banded DDC did not engage"
        )
        if extra_tunables and extra_tunables.get("wideband_fused_dispatch"):
            assert scanner._fused, "fused dispatch did not engage"
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


def test_fused_dispatch_recording(tmp_path):
    """tunables.wideband_fused_dispatch: channelize + scan + banded DDC in
    ONE dispatch per block. Recording reconcile then applies from the NEXT
    block (reference notification timing, recorder.cpp:58-73), so vs the
    split path every transmission must still be captured -- same signal set,
    >= 4 simultaneous -- with starts shifted by at most ~1 block and ends
    unchanged."""
    capture = _capture(tmp_path)
    serial = _run(tmp_path, capture, mesh_bands=0)
    fused = _run(
        tmp_path, capture, mesh_bands=8,
        extra_tunables={"wideband_fused_dispatch": True},
    )

    s_trans = [(t, p) for t, p in serial if t.endswith("/transmission/uint8")]
    f_trans = [(t, p) for t, p in fused if t.endswith("/transmission/uint8")]
    assert s_trans and f_trans

    def spans(trans):
        out = {}
        for _, p in trans:
            t_ms, s0, s1, rate, samples = decode_transmission(p)
            c = (s0 + s1) // 2
            end = t_ms + int(len(samples) // 2 * 1000 / rate)
            lo, hi = out.get(c, (t_ms, end))
            out[c] = (min(lo, t_ms), max(hi, end))
        return out

    s_spans, f_spans = spans(s_trans), spans(f_trans)
    # one sub-band block at 256 kHz sub-rate, default frames_per_block
    block_ms = 400  # 81920 samples / 256 kHz = 320 ms + slack
    for c, (s_lo, s_hi) in s_spans.items():
        near = [v for c2, v in f_spans.items() if abs(c2 - c) <= 5000]
        assert near, (c, sorted(f_spans))
        f_lo, f_hi = min(near)
        # fused starts AFTER the split path (next-block reconcile), by <= ~1
        # block; the tail is identical timing
        assert s_lo <= f_lo <= s_lo + 2 * block_ms, (c, s_lo, f_lo)
        assert abs(f_hi - s_hi) <= block_ms, (c, s_hi, f_hi)
    # every signal still recorded simultaneously where serial did
    assert len(f_spans) >= len(s_spans)
