"""Real Mqtt wrapper behavior against an in-process fake paho client.

Reference semantics under test (sources/network/mqtt.cpp): own worker thread,
bounded outbound queue with silent drop when full (mqtt.cpp:52-74), QoS-2
subscriptions replayed on (re)connect (mqtt.cpp:111-126), topic-callback
dispatch, reconnect retry loop, clean shutdown. Round-1 gap: only NullMqtt
was tested.
"""

import sys
import threading
import time
import types

import pytest


class FakePahoClient:
    instances = []

    def __init__(self, client_id="", clean_session=True):
        self.client_id = client_id
        self.clean_session = clean_session
        self.username = None
        self.password = None
        self.tls = False
        self.connects = []
        self.connect_failures = 0
        self.published = []
        self.subscribed = []
        self.loop_running = False
        self.disconnected = False
        self.on_message = None
        self.on_connect = None
        FakePahoClient.instances.append(self)

    def username_pw_set(self, username, password):
        self.username, self.password = username, password

    def tls_set(self, ca_certs=None):
        self.tls = True
        self.ca_certs = ca_certs

    def connect(self, host, port, keepalive=60):
        if self.connect_failures > 0:
            self.connect_failures -= 1
            raise OSError("connection refused")
        self.connects.append((host, port, keepalive))

    def loop_start(self):
        self.loop_running = True
        if self.on_connect:
            self.on_connect(self, None, None, 0)

    def loop_stop(self):
        self.loop_running = False

    def publish(self, topic, payload, qos=0):
        self.published.append((topic, bytes(payload), qos))

    def subscribe(self, topic, qos=0):
        self.subscribed.append((topic, qos))

    def disconnect(self):
        self.disconnected = True

    def deliver(self, topic, payload: bytes):
        msg = types.SimpleNamespace(topic=topic, payload=payload)
        self.on_message(self, None, msg)


def _install_fake_paho(monkeypatch):
    FakePahoClient.instances = []
    client_mod = types.ModuleType("paho.mqtt.client")
    client_mod.Client = FakePahoClient
    mqtt_mod = types.ModuleType("paho.mqtt")
    mqtt_mod.client = client_mod
    paho_mod = types.ModuleType("paho")
    paho_mod.mqtt = mqtt_mod
    monkeypatch.setitem(sys.modules, "paho", paho_mod)
    monkeypatch.setitem(sys.modules, "paho.mqtt", mqtt_mod)
    monkeypatch.setitem(sys.modules, "paho.mqtt.client", client_mod)


def _wait(predicate, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_url_parsing():
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import _parse_url

    assert _parse_url("tcp://broker:1883") == ("broker", 1883, False)
    assert _parse_url("ssl://broker:8883") == ("broker", 8883, True)
    assert _parse_url("mqtts://broker") == ("broker", 8883, True)
    assert _parse_url("broker") == ("broker", 1883, False)
    assert _parse_url("broker:1234") == ("broker", 1234, False)


def test_publish_subscribe_dispatch(monkeypatch):
    _install_fake_paho(monkeypatch)
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import Mqtt

    m = Mqtt("ssl://broker.example:8883", "user", "secret", client_id="t1")
    client = FakePahoClient.instances[-1]
    assert _wait(lambda: client.loop_running)
    assert client.connects == [("broker.example", 8883, 60)]
    assert client.tls and client.username == "user"

    received = []
    m.set_message_callback("sdr/list", received.append)
    m.publish("sdr/x/transmission/uint8", b"\x01\x02", qos=0)
    m.publish("sdr/x/spectrogram", "text-payload")
    assert _wait(lambda: len(client.published) == 2)
    assert client.published[0] == ("sdr/x/transmission/uint8", b"\x01\x02", 0)
    assert client.published[1][1] == b"text-payload"
    # QoS-2 subscription (mqtt.cpp:124)
    assert ("sdr/list", 2) in client.subscribed

    client.deliver("sdr/list", b"{}")
    client.deliver("sdr/other", b"ignored")
    assert received == ["{}"]
    m.stop()
    assert client.disconnected and not client.loop_running


def test_queue_bounded_silent_drop(monkeypatch):
    """mqtt.cpp:52-74: outbound queue caps at 1000, overflow drops silently."""
    _install_fake_paho(monkeypatch)
    import rtl_sdr_scanner_tpu.runtime.mqtt_client as mc

    # block the worker before it drains: delay connect
    client_holder = {}

    class SlowClient(FakePahoClient):
        def connect(self, host, port, keepalive=60):
            client_holder["ready"] = True
            time.sleep(0.5)
            super().connect(host, port, keepalive)

    sys.modules["paho.mqtt.client"].Client = SlowClient
    m = mc.Mqtt("tcp://broker:1883", "u", "p")
    assert _wait(lambda: client_holder.get("ready"))
    for i in range(mc.QUEUE_MAX_SIZE + 250):
        m.publish("t", b"x")
    assert m._queue.qsize() <= mc.QUEUE_MAX_SIZE + 1  # bounded, no exception
    client = FakePahoClient.instances[-1]
    assert _wait(lambda: len(client.published) >= mc.QUEUE_MAX_SIZE, timeout=10)
    m.stop()
    assert len(client.published) <= mc.QUEUE_MAX_SIZE + 1


def test_reconnect_retry_and_resubscribe(monkeypatch):
    """Connect failures retry (mqtt.cpp:30-38); subscriptions replay on the
    eventual connect (mqtt.cpp:111-126)."""
    _install_fake_paho(monkeypatch)
    import rtl_sdr_scanner_tpu.runtime.mqtt_client as mc

    monkeypatch.setattr(mc, "RECONNECT_INTERVAL_S", 0.05)

    class FlakyClient(FakePahoClient):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.connect_failures = 2

        def subscribe(self, topic, qos=0):
            if not self.connects:
                raise RuntimeError("not connected")
            super().subscribe(topic, qos)

    sys.modules["paho.mqtt.client"].Client = FlakyClient
    m = mc.Mqtt("tcp://broker:1883", "u", "p")
    m.set_message_callback("sdr/config/abc", lambda s: None)  # pre-connect
    client = FakePahoClient.instances[-1]
    assert _wait(lambda: client.loop_running, timeout=10)
    assert client.connect_failures == 0  # retried through both failures
    assert ("sdr/config/abc", 2) in client.subscribed  # resubscribed on connect
    m.stop()


def test_tls_ca_file_from_config(monkeypatch, tmp_path):
    """A private-CA broker needs its bundle passed through (round-3 missing
    #4; reference pins the system store path, mqtt.cpp:81-83)."""
    _install_fake_paho(monkeypatch)
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import Mqtt, make_mqtt

    m = Mqtt("ssl://broker:8883", "u", "p", ca_file="/etc/private/ca.pem")
    client = FakePahoClient.instances[-1]
    assert client.tls and client.ca_certs == "/etc/private/ca.pem"
    m.stop()

    # default: system store (ca_certs=None)
    m = Mqtt("ssl://broker:8883", "u", "p")
    client = FakePahoClient.instances[-1]
    assert client.tls and client.ca_certs is None
    m.stop()

    # wired through Config: env tier + JSON "mqtt" section
    import json as _json

    from rtl_sdr_scanner_tpu.runtime.config import Config, default_config_json

    raw = default_config_json()
    raw["mqtt"] = {"ca_file": "/from/json/ca.pem"}
    path = tmp_path / "c.json"
    path.write_text(_json.dumps(raw))
    monkeypatch.setenv("MQTT_URL", "ssl://broker:8883")
    monkeypatch.delenv("MQTT_CA_FILE", raising=False)
    cfg = Config.load_from_file(str(path), scan_hardware=False)
    assert cfg.mqtt_ca_file == "/from/json/ca.pem"
    monkeypatch.setenv("MQTT_CA_FILE", "/from/env/ca.pem")
    cfg = Config.load_from_file(str(path), scan_hardware=False)
    assert cfg.mqtt_ca_file == "/from/env/ca.pem"
    m = make_mqtt(cfg)
    client = FakePahoClient.instances[-1]
    assert client.ca_certs == "/from/env/ca.pem"
    m.stop()


def test_dropped_connection_redelivers_subscriptions(monkeypatch):
    """A MID-SESSION broker drop must re-deliver every subscription when the
    transport reconnects (mqtt.cpp:111-126 resubscribe-on-connect; round-3
    verdict #8). paho's network loop re-fires on_connect after an automatic
    reconnect; the wrapper replays its whole topic set there."""
    _install_fake_paho(monkeypatch)
    import rtl_sdr_scanner_tpu.runtime.mqtt_client as mc

    m = mc.Mqtt("tcp://broker:1883", "u", "p")
    client = FakePahoClient.instances[-1]
    assert _wait(lambda: client.loop_running)
    received = []
    m.set_message_callback("sdr/list", received.append)
    m.set_message_callback("sdr/config/abc", received.append)
    assert _wait(lambda: ("sdr/config/abc", 2) in client.subscribed)

    # broker drops the connection; paho auto-reconnects and fires on_connect
    client.subscribed.clear()
    client.on_connect(client, None, None, 0)
    assert ("sdr/list", 2) in client.subscribed
    assert ("sdr/config/abc", 2) in client.subscribed
    # dispatch still works after the reconnect
    client.deliver("sdr/list", b"{}")
    assert received == ["{}"]
    m.stop()


def test_make_mqtt_falls_back_without_env(monkeypatch):
    from rtl_sdr_scanner_tpu.runtime.mqtt_client import NullMqtt, make_mqtt

    class Cfg:
        mqtt_enabled = False
        mqtt_url = ""
        mqtt_username = ""
        mqtt_password = ""

    assert isinstance(make_mqtt(Cfg()), NullMqtt)
