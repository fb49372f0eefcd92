"""Application lifecycle: the reload loop of runtime/main.py.

Reference stack E (SURVEY.md section 3): remote config update -> persist ->
tear down scanners -> rebuild everything; SIGINT-style stop exits cleanly.
"""

import json
import threading
import time

import numpy as np

from rtl_sdr_scanner_tpu.runtime import main as main_mod
from rtl_sdr_scanner_tpu.runtime.config import default_config_json
from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt

RATE = 256000
CENTER = 145_000_000


def _write_capture(path, seconds=2.0):
    rng = np.random.default_rng(0)
    n = int(RATE * seconds)
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq.astype(np.complex64).view(np.float32).tofile(path)


def _config_json(capture):
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
    return raw


def test_main_run_reload_and_stop(tmp_path, monkeypatch):
    capture = tmp_path / "cap.cf32"
    _write_capture(capture)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_config_json(capture)))

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
        deadline = time.time() + 60
        while not mqtts and time.time() < deadline:
            time.sleep(0.05)
        assert mqtts, "runtime did not start"

        # remote config update (stack E): inject on sdr/config/{id}; the
        # runtime must persist the new config and rebuild the world
        first = mqtts[0]
        topic = next(t for t, _ in first._callbacks if t.startswith("sdr/config/"))
        new_cfg = _config_json(capture)
        new_cfg["workers"] = 3
        first.inject(topic, json.dumps(new_cfg))

        deadline = time.time() + 60
        while len(mqtts) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(mqtts) >= 2, "reload did not rebuild the runtime"
        saved = json.loads(cfg_path.read_text())
        assert saved["workers"] == 3  # persisted (config.cpp:110-123 shape)
        # ack published on .../success (remote_controller.cpp:37)
        assert any(t.endswith("/success") for t, _ in first.published)
    finally:
        main_mod._is_running = False
        t.join(timeout=60)
    assert result.get("rc") == 0


def test_main_skips_disabled_and_empty_devices(tmp_path, monkeypatch):
    capture = tmp_path / "cap.cf32"
    _write_capture(capture, seconds=0.5)
    raw = _config_json(capture)
    raw["devices"][0]["enabled"] = False
    raw["devices"].append(dict(raw["devices"][0], enabled=True, serial="r2", ranges=[]))
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(raw))

    scanners_made = []
    import rtl_sdr_scanner_tpu.runtime.scanner as scanner_mod

    real_scanner = scanner_mod.Scanner
    monkeypatch.setattr(
        main_mod, "Scanner", lambda *a, **k: scanners_made.append(1) or real_scanner(*a, **k)
    )
    monkeypatch.setattr(main_mod, "make_mqtt", lambda cfg: NullMqtt())

    main_mod._is_running = True

    def stop_soon():
        time.sleep(1.0)
        main_mod._is_running = False

    threading.Thread(target=stop_soon).start()
    assert main_mod.run(str(cfg_path)) == 0
    assert scanners_made == []  # both devices skipped (main.cpp:51-63 rules)


def test_main_joins_distributed_runtime_once(tmp_path, monkeypatch):
    """tunables.multihost makes run() call multihost.initialize exactly once
    across reloads (jax.distributed can only be joined once per process)."""
    capture = tmp_path / "cap_mh.cf32"
    _write_capture(capture)
    raw = _config_json(capture)
    raw["tunables"] = {"multihost": True}
    cfg_path = tmp_path / "config_mh.json"
    cfg_path.write_text(json.dumps(raw))

    from rtl_sdr_scanner_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost, "initialize", lambda *a, **k: calls.append(1))
    monkeypatch.setattr(main_mod, "make_mqtt", lambda cfg: NullMqtt())

    main_mod._is_running = True

    def stop_soon():
        time.sleep(1.0)
        main_mod._is_running = False

    threading.Thread(target=stop_soon).start()
    assert main_mod.run(str(cfg_path)) == 0
    assert calls == [1], calls


def test_main_exits_on_fatal_scanner_failure(tmp_path, monkeypatch):
    """A scanner thread dying on a fatal error must stop the app (reference
    exit(1) on stream error, sdr_source.cpp:38-41) instead of polling
    forever with a dead scanner."""
    capture = tmp_path / "cap.cf32"
    _write_capture(capture)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_config_json(capture)))

    class FailingScanner:
        def __init__(self, *a, **k):
            self.failed = False

        def start(self):
            def die():
                time.sleep(0.2)
                self.failed = True

            threading.Thread(target=die, daemon=True).start()

        def stop(self):
            pass

    monkeypatch.setattr(main_mod, "Scanner", FailingScanner)
    monkeypatch.setattr(main_mod, "make_mqtt", lambda cfg: NullMqtt())
    main_mod._is_running = True
    result = {}
    t = threading.Thread(
        target=lambda: result.setdefault("rc", main_mod.run(str(cfg_path)))
    )
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "main.run did not exit on scanner failure"
    assert main_mod._is_running is False
    # exit code 1 so a container supervisor keyed on the code restarts us
    # (reference exit(1), sdr_source.cpp:38-41; round-4 advisor medium)
    assert result["rc"] == 1


def test_scanner_thread_failure_sets_flag(tmp_path, monkeypatch):
    """A hard mid-stream readStream error surfaces as Scanner.failed with a
    logged error, not a silent dead thread."""
    import sys

    from tests.fake_soapy import make_fake_soapy

    fake = make_fake_soapy(
        total_samples=RATE * 30, short_read_max=8192, inject_results={6: -7}
    )
    monkeypatch.setitem(sys.modules, "SoapySDR", fake)

    from rtl_sdr_scanner_tpu.runtime.config import Config
    from rtl_sdr_scanner_tpu.runtime.scanner import Scanner

    raw = _config_json("ignored")
    del raw["devices"][0]["file"]
    del raw["devices"][0]["file_format"]
    raw["devices"][0]["driver"] = "rtlsdr"
    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps(raw))
    cfg = Config.load_from_file(str(cfg_path), scan_hardware=False)
    s = Scanner(cfg, cfg.devices[0], NullMqtt(), recorders_count=1)
    s.start()
    deadline = time.time() + 20
    while not s.failed and time.time() < deadline:
        time.sleep(0.05)
    assert s.failed, "scanner did not surface the stream failure"
    s.stop()
