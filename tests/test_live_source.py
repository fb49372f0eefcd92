"""Live-source path: SoapySource + ingest ring + Scanner lifecycle.

Covers reference sdr_source.cpp:11-90 behaviors (AGC off, per-element gains,
sample rate, x10 retune retry, rtlsdr reset quirk, stream teardown) and the
live Scanner.start/stop lifecycle -- all against the in-process fake SoapySDR
(tests/fake_soapy.py). The reference has NO tests for any of this.
"""

import json
import sys
import time

import numpy as np
import pytest

from tests.fake_soapy import fm_synth, make_fake_soapy

RATE = 256000
CENTER = 145_000_000
SHIFT = 30_000


def _device_spec(driver="rtlsdr"):
    from rtl_sdr_scanner_tpu.runtime.config import DeviceSpec

    return DeviceSpec(
        enabled=True,
        serial="fake0",
        driver=driver,
        sample_rate=RATE,
        start_level=8.0,
        stop_level=5.0,
        gains=[("LNA", 32.8), ("VGA", 20.0)],
        ranges=[(CENTER - 100000, CENTER + 100000)],
    )


def _make_source(monkeypatch, **fake_kwargs):
    fake = make_fake_soapy(**fake_kwargs)
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)
    from rtl_sdr_scanner_tpu.runtime.sources import SoapySource

    return SoapySource(_device_spec()), fake


def test_soapy_source_setup(monkeypatch):
    """AGC disabled, per-element gains applied, rate set (sdr_source.cpp:13-21),
    stream activated; epoch clock is wall-anchored."""
    before = int(time.time() * 1000)
    src, fake = _make_source(monkeypatch)
    dev = fake.devices[0]
    assert dev.agc is False
    assert dev.gains_set == [("LNA", 32.8), ("VGA", 20.0)]
    assert dev.sample_rate_calls == [RATE]
    assert dev.stream_active
    assert before <= src.session_epoch_ms <= int(time.time() * 1000)
    src.close()
    assert dev.stream_closed and not dev.stream_active


def test_set_center_frequency_retries_x10(monkeypatch):
    """sdr_source.cpp:82-88: retried up to 10 times."""
    src, fake = _make_source(monkeypatch, tune_failures=9)
    assert src.set_center_frequency(CENTER) is True
    assert fake.devices[0].tune_attempts == 10
    assert fake.devices[0].frequency == CENTER

    src2, fake2 = _make_source(monkeypatch, tune_failures=10)
    assert src2.set_center_frequency(CENTER) is False
    assert fake2.devices[-1].tune_attempts == 10


def test_reset_buffers_quirk(monkeypatch):
    """sdr_source.cpp:68-78: rtlsdr re-sets the sample rate; every other
    driver bounces the stream."""
    src, fake = _make_source(monkeypatch)
    dev = fake.devices[0]
    src.reset_buffers()  # driver is rtlsdr
    assert dev.sample_rate_calls == [RATE, RATE]
    assert dev.deactivate_calls == 0

    fake2 = make_fake_soapy()
    monkeypatch.setitem(sys.modules, "SoapySDR", fake2)
    from rtl_sdr_scanner_tpu.runtime.sources import SoapySource

    src2 = SoapySource(_device_spec(driver="hackrf"))
    dev2 = fake2.devices[0]
    src2.reset_buffers()
    assert dev2.deactivate_calls == 1 and dev2.activate_calls == 2
    assert dev2.sample_rate_calls == [RATE]


def test_ingest_ring_feed_preserves_stream(monkeypatch):
    """start_streaming decouples reads through the native SPSC ring; the
    consumed stream equals the synthesized stream sample-for-sample."""
    total = RATE // 2  # half a second fits the ring (2 s capacity)
    synth = fm_synth(SHIFT, 0.0, 1.0)
    src, fake = _make_source(monkeypatch, synth=synth, total_samples=total)
    src.start_streaming()
    block = src.read_block(total // 2)
    block2 = src.read_block(total // 2)
    src.stop_streaming()
    got = np.concatenate([block, block2])
    expected = synth(0, total, RATE)
    np.testing.assert_array_equal(got, expected)
    assert src.stream_time_ms() == int(total * 1000 // RATE)
    src.close()
    assert fake.devices[0].stream_closed


def test_ingest_ring_overflow_surfaced(monkeypatch):
    """A consumer slower than line rate must overflow the ring LOUDLY:
    dropped_bytes grows and a warning is logged (reference analog: SoapySDR
    overflow surfaces in readStream returns, sdr_source.cpp:34-41)."""
    from rtl_sdr_scanner_tpu.constants import Tunables

    fake = make_fake_soapy(total_samples=RATE * 4)
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)
    from rtl_sdr_scanner_tpu.runtime.sources import SoapySource

    src = SoapySource(
        _device_spec(), tunables=Tunables(ingest_ring_seconds=0.05)
    )
    src.start_streaming()  # nobody consumes: the tiny ring must overflow
    deadline = time.time() + 5.0
    while src.dropped_bytes == 0 and time.time() < deadline:
        time.sleep(0.01)
    assert src.dropped_bytes > 0
    deadline = time.time() + 2.0
    while src._drop_warnings == 0 and time.time() < deadline:
        time.sleep(0.01)
    assert src._drop_warnings >= 1
    src.close()


def test_short_reads_assemble_full_blocks(monkeypatch):
    """Drivers routinely return fewer elements than asked; both the direct
    and the ring-fed paths must assemble full blocks across short reads
    without altering the stream (round-3 verdict #9)."""
    total = RATE // 4
    synth = fm_synth(SHIFT, 0.0, 1.0)
    expected = synth(0, total, RATE)

    # direct path: read_block loops until the block is complete
    src, fake = _make_source(
        monkeypatch, synth=synth, total_samples=total, short_read_max=777
    )
    got = src.read_block(total)
    np.testing.assert_array_equal(got, expected)
    assert fake.devices[0].read_calls >= total // 777
    src.close()

    # ring path: the reader thread fills the ring in short chunks
    src2, fake2 = _make_source(
        monkeypatch, synth=synth, total_samples=total, short_read_max=1001
    )
    src2.start_streaming()
    got2 = src2.read_block(total)
    src2.stop_streaming()
    np.testing.assert_array_equal(got2, expected)
    src2.close()


def test_transient_timeouts_recover(monkeypatch):
    """SOAPY_SDR_TIMEOUT mid-stream is benign back-pressure, not an error:
    the ring reader retries and the stream stays gapless (the reference
    exit(1)s on ANY negative code, sdr_source.cpp:34-41 -- recovering from
    timeouts is a deliberate improvement, kept loud only for real errors)."""
    from tests.fake_soapy import SOAPY_SDR_TIMEOUT

    total = RATE // 4
    synth = fm_synth(SHIFT, 0.0, 1.0)
    src, fake = _make_source(
        monkeypatch,
        synth=synth,
        total_samples=total,
        short_read_max=4096,
        inject_results={1: SOAPY_SDR_TIMEOUT, 3: SOAPY_SDR_TIMEOUT},
    )
    src.start_streaming()
    got = src.read_block(total)
    src.stop_streaming()
    np.testing.assert_array_equal(got, synth(0, total, RATE))
    assert fake.devices[0].read_calls > 4
    src.close()


def test_stream_error_stops_reader_and_raises(monkeypatch):
    """A non-timeout readStream error is fatal for the stream: the reader
    thread stops and the next read_block raises (reference exit(1),
    sdr_source.cpp:38-41; recovery is the supervisor's job)."""
    synth = fm_synth(SHIFT, 0.0, 1.0)
    src, fake = _make_source(
        monkeypatch,
        synth=synth,
        total_samples=RATE,
        short_read_max=4096,
        inject_results={2: -7},  # SOAPY_SDR_UNDERFLOW-class hard error
    )
    src.start_streaming()
    with pytest.raises(RuntimeError, match="stream error"):
        # 2 good short reads land 8192 samples; the error then stops the
        # reader before the block can complete
        src.read_block(RATE // 2)
    src.close()

    # direct path: the error raises immediately
    src2, fake2 = _make_source(
        monkeypatch, synth=synth, total_samples=RATE, inject_results={0: -2}
    )
    with pytest.raises(RuntimeError, match="readStream error"):
        src2.read_block(1024)
    src2.close()


def test_ingest_ring_overflow_fatal(monkeypatch):
    """ingest_overflow_fatal stops the stream on the first drop and read_block
    raises -- the replay/CI mode where a drop means a bug."""
    from rtl_sdr_scanner_tpu.constants import Tunables

    fake = make_fake_soapy(total_samples=RATE * 4)
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)
    from rtl_sdr_scanner_tpu.runtime.sources import SoapySource

    src = SoapySource(
        _device_spec(),
        tunables=Tunables(ingest_ring_seconds=0.05, ingest_overflow_fatal=True),
    )
    src.start_streaming()
    with pytest.raises(RuntimeError, match="overflow"):
        for _ in range(1000):
            src.read_block(RATE // 10)
    src.close()


def _live_config(tmp_path, compact=True):
    from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json

    raw = default_config_json()
    raw["tunables"] = {"compact_detection": compact, "initial_delay_ms": 10}
    raw["recording"] = {
        "max_noise_time_ms": 1000,
        "min_sample_rate": 16000,
        "min_time_ms": 1000,
        "step": 2500,
    }
    raw["devices"] = [
        {
            "enabled": True,
            "serial": "fake0",
            "driver": "rtlsdr",
            "sample_rate": RATE,
            "start_recording_level": 8,
            "stop_recording_level": 5,
            "gains": [{"name": "LNA", "value": 32.8}],
            "ranges": [{"start": CENTER - 100000, "stop": CENTER + 100000}],
        }
    ]
    raw["workers"] = 2
    path = tmp_path / "config.json"
    path.write_text(json.dumps(raw))
    return Config.load_from_file(str(path), scan_hardware=False)


def test_live_scan_epoch_timestamps(monkeypatch, tmp_path):
    """Full live-mode slice, stepped synchronously: detection works off the
    fake front-end and the PAYLOAD clock is epoch milliseconds
    (utils.cpp:14 getTime; data_controller.cpp:33), not stream-relative.

    Streams 8 s of synthetic NFM keyed at 2.5-5.5 s (after the 2 s noise
    learning window)."""
    from rtl_sdr_scanner_tpu.runtime.data_controller import decode_transmission
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

    fake = make_fake_soapy(synth=fm_synth(SHIFT, 2.5, 5.5), total_samples=8 * RATE)
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)

    cfg = _live_config(tmp_path)
    mqtt = NullMqtt()
    mqtt.keep_payloads = True
    before = int(time.time() * 1000)
    scanner = Scanner(cfg, cfg.devices[0], mqtt, recorders_count=2)
    epoch = scanner.device._session_epoch_ms
    assert before <= epoch <= int(time.time() * 1000)

    # step synchronously until the fake front-end is exhausted (readStream
    # returns TIMEOUT -> the direct read path raises)
    with pytest.raises(RuntimeError):
        while scanner.step():
            pass

    trans = [decode_transmission(p) for t, p in mqtt.published if t.endswith("/transmission/uint8")]
    assert trans, "live transmission not detected"
    by_center = {}
    for t0, start, stop, rate, iq in trans:
        by_center.setdefault((start + stop) // 2, []).append((t0, iq))
    main = max(by_center, key=lambda c: sum(len(x) for _, x in by_center[c]))
    assert abs(main - (CENTER + SHIFT)) <= 2500
    # wire time = epoch + stream ms: within the keyed window, wall-plausible
    t_first = by_center[main][0][0]
    assert epoch + 2000 <= t_first <= epoch + 9000, (t_first, epoch)
    assert t_first > 1_500_000_000_000  # an actual epoch timestamp, not 1970

    # flush cadence (recorder.cpp:35 RECORDER_FLUSH_INTERVAL): payloads are
    # <=interval-sized chunks with sub-block monotone stamps
    interval = cfg.tunables.recorder_flush_interval_ms
    flush_samples = int(16000 * interval / 1000)
    sizes = [len(iq) for _, iq in by_center[main]]
    stamps = [t0 for t0, _ in by_center[main]]
    assert max(sizes) <= flush_samples
    assert len(sizes) >= 3
    assert stamps == sorted(stamps)
    deltas = np.diff(stamps)
    assert deltas.max() <= interval + 1  # successive chunks <= one interval apart


def test_live_scanner_thread_lifecycle(monkeypatch, tmp_path):
    """Scanner.start/stop: worker + reader threads run and shut down cleanly,
    the stream is closed, and the first tune waits initial_delay_ms
    (sdr_device.cpp:55-61)."""
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt
    from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

    fake = make_fake_soapy()  # unbounded noise
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)

    cfg = _live_config(tmp_path)
    scanner = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=1)

    slept = []
    real_sleep = time.sleep
    monkeypatch.setattr(
        "rtl_sdr_scanner_tpu.runtime.scanner.time.sleep",
        lambda s: (slept.append(s), real_sleep(min(s, 0.01)))[1],
    )
    scanner.start()
    deadline = time.time() + 30
    while scanner._source._samples_read < 3 * RATE and time.time() < deadline:
        real_sleep(0.05)
    scanner.stop()
    dev = fake.devices[0]
    assert scanner._thread is None
    assert scanner._source._reader is None  # reader thread joined
    assert dev.stream_closed
    assert 0.01 in slept  # initial_delay_ms=10 honored on first tune
    assert scanner._source._samples_read >= 3 * RATE


def test_device_probe_creates_entry(monkeypatch):
    """sdr_device_reader.cpp:59-99: new hardware gets defaults -- max gains,
    8/5 levels, seed range at the best supported rate."""
    fake = make_fake_soapy(enumerate_results=[{"serial": "abc", "driver": "rtlsdr"}])
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)
    from rtl_sdr_scanner_tpu.runtime.device_reader import scan_soapy_devices

    config = {"devices": []}
    scan_soapy_devices(config)
    assert len(config["devices"]) == 1
    dev = config["devices"][0]
    assert dev["serial"] == "abc" and dev["driver"] == "rtlsdr"
    assert dev["start_recording_level"] == 8 and dev["stop_recording_level"] == 5
    assert dev["sample_rate"] == 2048000  # best seed-preferred supported rate
    assert dev["ranges"] == [{"start": 144000000, "stop": 146000000}]
    assert dev["gains"] == [{"name": "LNA", "value": 49.6}, {"name": "VGA", "value": 49.6}]


def test_device_probe_snaps_existing_rate(monkeypatch):
    """sdr_device_reader.cpp:37-57: existing entries get sample_rate snapped
    to the nearest supported."""
    fake = make_fake_soapy(enumerate_results=[{"serial": "abc", "driver": "rtlsdr"}])
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)
    from rtl_sdr_scanner_tpu.runtime.device_reader import scan_soapy_devices

    config = {"devices": [{"serial": "abc", "sample_rate": 900000}]}
    scan_soapy_devices(config)
    assert config["devices"][0]["sample_rate"] == 1024000
    assert config["devices"][0]["driver"] == "rtlsdr"
