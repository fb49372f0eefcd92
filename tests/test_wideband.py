"""Wideband concurrent-band scanning: two SIMULTANEOUS transmissions in
different sub-bands of one 2.048 Msps capture are both detected and recorded
-- something the reference's time-multiplexed hopping cannot do."""

import json

import numpy as np

from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json
from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.wideband import WidebandScanner

RATE = 2_048_000
B = 8
CENTER = 145_000_000
F1 = 500_000  # channel 2 (center +512 kHz)
F2 = -750_000  # channel 5 (center -768 kHz)


def _capture(tmp_path):
    rng = np.random.default_rng(12)
    secs = 8.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    keyed = (t >= 3.0) & (t < 6.0)
    for f, tone in ((F1, 800), (F2, 1200)):
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * f * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
        iq += 0.4 * np.exp(1j * phase) * keyed
    path = tmp_path / "wide.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(path)
    return path


def test_two_simultaneous_bands(tmp_path):
    capture = _capture(tmp_path)
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
            "serial": "wide0",
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
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    assert cfg.devices[0].channels == B

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    scanner.run_to_completion()

    trans = [decode_transmission(p) for t, p in mqtt.published if t.endswith("uint8")]
    assert trans, "no transmissions recorded"
    centers = sorted({(s0 + s1) // 2 for _, s0, s1, _, _ in trans})
    # both simultaneous transmissions captured, at their absolute frequencies
    assert any(abs(c - (CENTER + F1)) <= 2500 for c in centers), centers
    assert any(abs(c - (CENTER + F2)) <= 2500 for c in centers), centers

    # each recording FM-demodulates back to its own audio tone
    for f_expect, tone in ((F1, 800), (F2, 1200)):
        chunks = [
            iq
            for _, s0, s1, _, iq in trans
            if abs((s0 + s1) // 2 - (CENTER + f_expect)) <= 2500
        ]
        z = np.concatenate(chunks)
        z = z[:, 0].astype(np.float32) + 1j * z[:, 1].astype(np.float32)
        z = z[len(z) // 4 :]
        d = np.angle(z[1:] * np.conj(z[:-1]))
        sp = np.abs(np.fft.rfft(d - d.mean()))
        f_audio = np.argmax(sp) / len(d) * 16000
        assert abs(f_audio - tone) < 50, (f_expect, f_audio)

    # spectrograms flow per sub-band
    spectro = [t for t, _ in mqtt.published if t.endswith("/spectrogram")]
    assert spectro


def test_oversampled_captures_boundary_signal(tmp_path):
    """A transmission at the exact boundary between two sub-bands -- the
    critically-sampled bank's documented blind spot -- is captured cleanly
    with tunables.channelizer_oversample=2 and FM-demodulates back."""
    f_edge = RATE // B + RATE // (2 * B)  # boundary between channels 1 and 2
    rng = np.random.default_rng(31)
    secs = 8.0
    n = int(RATE * secs)
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 900 * t)
    phase = 2 * np.pi * f_edge * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * ((t >= 3.0) & (t < 6.0))
    capture = tmp_path / "edge.cf32"
    iq.astype(np.complex64).view(np.float32).tofile(capture)

    raw = default_config_json()
    raw["tunables"] = {"channelizer_oversample": 2}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "wide2x",
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
    cfg_path = tmp_path / "config2x.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)

    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    scanner = WidebandScanner(cfg, cfg.devices[0], mqtt, recorders_count=8)
    assert scanner._oversample == 2
    scanner.run_to_completion()

    trans = [decode_transmission(p) for t_, p in mqtt.published if t_.endswith("uint8")]
    assert trans, "boundary transmission not captured by the 2x bank"
    by_center = {}
    for t0, s0, s1, rate_, iq_ in trans:
        by_center.setdefault((s0 + s1) // 2, []).append(iq_)
    main = max(by_center, key=lambda c: sum(len(x) for x in by_center[c]))
    assert abs(main - (CENTER + f_edge)) <= 10_000, (main, CENTER + f_edge)

    z = np.concatenate(by_center[main])
    z = z[:, 0].astype(np.float32) + 1j * z[:, 1].astype(np.float32)
    z = z[len(z) // 4 :]
    d = np.angle(z[1:] * np.conj(z[:-1]))
    sp = np.abs(np.fft.rfft(d - d.mean()))
    f_audio = np.argmax(sp) / len(d) * 16000
    assert abs(f_audio - 900) < 50, f_audio
