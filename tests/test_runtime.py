"""Host runtime units: config, migrator, wire codec, replay sources, native."""

import json

import numpy as np
import pytest

from rtl_sdr_scanner_tpu import native
from rtl_sdr_scanner_tpu.runtime.config import Config, DeviceSpec, default_config_json
from rtl_sdr_scanner_tpu.runtime.config_migrator import migrate, sort_config
from rtl_sdr_scanner_tpu.runtime.data_controller import (
    decode_spectrogram,
    decode_transmission,
    encode_spectrogram,
    encode_transmission,
)
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
from rtl_sdr_scanner_tpu.runtime.remote_controller import RemoteController
from rtl_sdr_scanner_tpu.runtime.sources import ReplaySource


def _device_json(**kw):
    base = {
        "enabled": True,
        "serial": "00000001",
        "driver": "rtlsdr",
        "sample_rate": 2048000,
        "start_recording_level": 8,
        "stop_recording_level": 5,
        "gains": [{"name": "TUNER", "value": 28.0}],
        "ranges": [{"start": 144000000, "stop": 146000000}],
    }
    base.update(kw)
    return base


def test_config_parsing(tmp_path):
    raw = default_config_json()
    raw["devices"] = [_device_json()]
    raw["ignored_frequencies"] = [{"frequency": 145000000, "bandwidth": 20000}]
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))

    cfg = Config.load_from_file(str(path), scan_hardware=False)
    assert len(cfg.devices) == 1
    dev = cfg.devices[0]
    assert dev.name == "rtlsdr_00000001"
    assert dev.sample_rate == 2048000
    assert dev.gains == [("TUNER", 28.0)]
    assert cfg.ignored_ranges == [(144990000, 145010000)]
    assert cfg.recording_bandwidth == 32000
    assert cfg.recording_tuning_step == 2500
    assert cfg.recorders_count() >= 1


def test_config_migrator_sorts():
    raw = default_config_json()
    raw["version"] = 0
    raw["ignored_frequencies"] = [
        {"frequency": 200, "bandwidth": 10},
        {"frequency": 100, "bandwidth": 20},
        {"frequency": 100, "bandwidth": 10},
    ]
    raw["devices"] = [
        _device_json(ranges=[{"start": 430000000, "stop": 440000000}, {"start": 144000000, "stop": 146000000}])
    ]
    migrate(raw)
    sort_config(raw)
    assert raw["version"] == 2
    assert [i["frequency"] for i in raw["ignored_frequencies"]] == [100, 100, 200]
    assert [i["bandwidth"] for i in raw["ignored_frequencies"]][:2] == [10, 20]
    assert raw["devices"][0]["ranges"][0]["start"] == 144000000


def test_tunables_override(tmp_path):
    raw = default_config_json()
    raw["tunables"] = {"grouping_x": 11, "frames_per_block": 8, "bogus_knob": 1}
    path = tmp_path / "c.json"
    path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(path), scan_hardware=False)
    assert cfg.tunables.grouping_x == 11
    assert cfg.tunables.frames_per_block == 8
    assert cfg.tunables.grouping_y == 21  # untouched default


def test_transmission_codec_roundtrip_and_layout():
    iq = np.array([[1, -2], [127, -128], [0, 5]], dtype=np.int8)
    payload = encode_transmission(1234567890123, 145_250_000, 16000, iq)
    # layout: u64 time | i32 start | i32 stop | u32 rate | bytes ^ 0x80
    assert len(payload) == 8 + 4 + 4 + 4 + 6
    t, start, stop, rate, back = decode_transmission(payload)
    assert (t, start, stop, rate) == (1234567890123, 145_242_000, 145_258_000, 16000)
    np.testing.assert_array_equal(back, iq)
    # XOR 0x80 offset-binary check on the raw bytes (data_controller.cpp:38-40)
    assert payload[20] == (1 ^ 0x80) and payload[21] == ((-2) & 0xFF) ^ 0x80


def test_spectrogram_codec_roundtrip():
    bins = np.arange(-64, 64, dtype=np.int8)
    payload = encode_spectrogram(99, 145_000_000, 2048000, bins)
    t, start, stop, step, back = decode_spectrogram(payload)
    assert (t, start, stop) == (99, 143_976_000, 146_024_000)
    assert step == 2048000 // 128
    np.testing.assert_array_equal(back, bins)


def test_native_codec_matches_numpy():
    data = np.random.default_rng(0).integers(-128, 128, size=1001, dtype=np.int8)
    out = native.xor_offset_binary(data)
    np.testing.assert_array_equal(out, data.view(np.uint8) ^ 0x80)
    z = native.cs8_to_complex64(data[:1000])
    ref = data[:1000].astype(np.float32) / 127.5
    np.testing.assert_allclose(z.view(np.float32), ref, rtol=1e-6)
    back = native.complex64_to_cs8(z * 127.5 / 127.0)
    np.testing.assert_array_equal(back.ravel()[: 10], data[:10])


def test_replay_source_formats(tmp_path):
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64) * 0.1

    cf32 = tmp_path / "x.cf32"
    iq.view(np.float32).tofile(cf32)
    src = ReplaySource(
        DeviceSpec(True, "f", "replay", 250000, 8, 5, file=str(cf32), file_format="cf32")
    )
    blk = src.read_block(256)
    np.testing.assert_array_equal(blk, iq[:256])
    assert src.stream_time_ms() == 256 * 1000 // 250000

    cs8 = tmp_path / "x.cs8"
    raw = np.clip(np.round(iq.view(np.float32) * 127.5), -128, 127).astype(np.int8)
    raw.tofile(cs8)
    src8 = ReplaySource(
        DeviceSpec(True, "f", "replay", 250000, 8, 5, file=str(cs8), file_format="cs8")
    )
    blk8 = src8.read_block(256)
    np.testing.assert_allclose(blk8, iq[:256], atol=1 / 127.5)
    src8b = ReplaySource(
        DeviceSpec(True, "f", "replay", 250000, 8, 5, file=str(cs8), file_format="cs8")
    )
    ints = src8b.read_block_int8(256)
    np.testing.assert_array_equal(ints.ravel(), raw[:512])

    # exhaustion without loop
    src.read_block(1000)
    assert src.read_block(1000) is None
    assert src.exhausted


def test_remote_controller_flow():
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    raw = default_config_json()
    cfg = Config(raw)
    received = []
    RemoteController(cfg, "abc", mqtt, received.append)

    mqtt.inject("sdr/list", "")
    topics = [t for t, _ in mqtt.published]
    assert "sdr/status/abc" in topics

    mqtt.inject("sdr/config/abc", json.dumps({"version": 2}))
    assert received == [{"version": 2}]
    assert any(t == "sdr/config/abc/success" for t, _ in mqtt.published)

    mqtt.inject("sdr/config/abc", "{not json")
    assert any(t == "sdr/config/abc/failed" for t, _ in mqtt.published)


def test_remote_controller_manual_recording_and_restart():
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    cfg = Config(default_config_json())
    manual = []
    restarted = []
    RemoteController(
        cfg,
        "abc",
        mqtt,
        lambda _cfg: None,
        manual_recording_callback=lambda f, d: (manual.append((f, d)), True)[1],
        restart_callback=lambda: restarted.append(True),
    )

    mqtt.inject(
        "sdr/manual_recording",
        json.dumps({"frequency": 145_030_000, "duration_ms": 2500}),
    )
    assert manual == [(145_030_000, 2500)]

    mqtt.inject("sdr/manual_recording", json.dumps({"frequency": 145_000_000}))
    assert manual[-1] == (145_000_000, 10_000)  # default duration

    mqtt.inject("sdr/manual_recording", "{not json")  # must not raise
    mqtt.inject("sdr/manual_recording", json.dumps({"duration_ms": 5}))  # no freq
    assert len(manual) == 2

    mqtt.inject("sdr/restart/abc", "")
    assert restarted == [True]


def test_flush_spectrogram_covers_all_hop_centers(tmp_path):
    """Frequency-hopping sessions leave partial spectrogram sums in OTHER
    centers' containers; session-stop flush must send each under its own
    center frequency (round-3 advisor finding)."""
    from rtl_sdr_scanner_tpu.runtime.sdr_device import SdrDevice, SpectroContainer

    raw = default_config_json()
    raw["devices"] = [_device_json(serial="flushdev")]
    path = tmp_path / "c.json"
    path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(path), scan_hardware=False)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    dev = SdrDevice(cfg, cfg.devices[0], mqtt, recorders_count=1)
    dev.set_frequency_range((144_000_000, 146_000_000), now_ms=0)

    size = dev.scan_cfg.spectro_size
    other_center = 147_000_000
    current = dev.center_frequency
    for center, level in ((current, 10.0), (other_center, 20.0)):
        container = SpectroContainer(size, 0)
        container.sum[:] = level
        container.counter = 1
        dev._spectro_containers[center] = container

    dev.flush_spectrogram(5000)
    spectro = [
        decode_spectrogram(p) for t, p in mqtt.published if t.endswith("/spectrogram")
    ]
    centers = sorted(s[1] + (s[2] - s[1]) // 2 for s in spectro)
    assert len(spectro) == 2, mqtt.published
    assert centers == sorted([current, other_center])
    # every container drained
    assert all(c.counter == 0 for c in dev._spectro_containers.values())


def test_multihost_env_contract_validation(monkeypatch):
    """initialize() must reject a malformed/missing env contract with a clear
    error naming the variable (round-3 advisor finding)."""
    from rtl_sdr_scanner_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    with pytest.raises(ValueError, match="JAX_COORDINATOR_ADDRESS"):
        multihost.initialize()

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="JAX_PROCESS_ID"):
        multihost.initialize()

    monkeypatch.setenv("JAX_NUM_PROCESSES", "two")
    with pytest.raises(ValueError, match="JAX_NUM_PROCESSES"):
        multihost.initialize()

    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "5")
    with pytest.raises(ValueError, match="out of range"):
        multihost.initialize()

    # single process: no contract required, no distributed init
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    multihost.initialize()
