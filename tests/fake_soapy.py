"""In-process SoapySDR test double.

The reference never tests its hardware path (SURVEY.md section 4: no mocks
for SoapySDR anywhere); this fake closes that gap. It implements the exact
API surface SoapySource (runtime/sources.py) and the device probe
(runtime/device_reader.py) touch, synthesizing deterministic IQ so the full
live lifecycle -- gains/AGC setup, streaming, retune retries, reset quirks,
ring-fed reads, Scanner.start/stop -- runs without hardware.

Install with: monkeypatch.setitem(sys.modules, "SoapySDR", make_fake_soapy(...))
"""

from __future__ import annotations

import types
from typing import Callable, Optional

import numpy as np

SOAPY_SDR_RX = 1
SOAPY_SDR_TIMEOUT = -1


class _StreamResult:
    def __init__(self, ret: int):
        self.ret = ret


class _GainRange:
    def __init__(self, lo: float, hi: float):
        self._lo, self._hi = lo, hi

    def minimum(self) -> float:
        return self._lo

    def maximum(self) -> float:
        return self._hi


class FakeDevice:
    """One simulated front-end (reference behaviors from sdr_source.cpp)."""

    def __init__(
        self,
        args,
        sample_rates=(256000, 1024000, 2048000),
        gains=("LNA", "VGA"),
        synth: Optional[Callable[[int, int, float], np.ndarray]] = None,
        total_samples: Optional[int] = None,
        tune_failures: int = 0,
        short_read_max: Optional[int] = None,
        inject_results: Optional[dict] = None,
    ):
        self.args = dict(args)
        self.sample_rates = list(sample_rates)
        self.gain_names = list(gains)
        # recorded interactions
        self.agc = None
        self.gains_set = []
        self.sample_rate_calls = []
        self.frequency = None
        self.tune_attempts = 0
        self.stream_active = False
        self.stream_closed = False
        self.activate_calls = 0
        self.deactivate_calls = 0
        # synthesis
        self._synth = synth
        self._total = total_samples
        self._cursor = 0
        self._rate = sample_rates[0]
        self._tune_failures = tune_failures
        # failure repertoire (round-3 verdict #9): drivers routinely return
        # SHORT reads (fewer elements than asked), transient timeouts, and
        # error codes mid-stream -- SoapySource must assemble/recover/raise
        self._short_read_max = short_read_max  # cap elements per readStream
        self._inject = dict(inject_results or {})  # read call index -> code
        self.read_calls = 0

    # -- configuration (sdr_source.cpp:13-21) -------------------------------

    def setGainMode(self, direction, channel, enabled):
        self.agc = bool(enabled)

    def setGain(self, direction, channel, name, value):
        self.gains_set.append((name, float(value)))

    def setSampleRate(self, direction, channel, rate):
        self.sample_rate_calls.append(int(rate))
        self._rate = int(rate)

    def listSampleRates(self, direction, channel):
        return list(self.sample_rates)

    def listGains(self, direction, channel):
        return list(self.gain_names)

    def getGainRange(self, direction, channel, name):
        return _GainRange(0.0, 49.6)

    # -- tuning (sdr_source.cpp:80-88: caller retries x10) -------------------

    def setFrequency(self, direction, channel, frequency):
        self.tune_attempts += 1
        if self._tune_failures > 0:
            self._tune_failures -= 1
            raise RuntimeError("tuner busy")
        self.frequency = int(frequency)

    # -- streaming -----------------------------------------------------------

    def setupStream(self, direction, fmt):
        assert fmt == "CF32"
        return object()

    def activateStream(self, stream):
        self.stream_active = True
        self.activate_calls += 1

    def deactivateStream(self, stream):
        self.stream_active = False
        self.deactivate_calls += 1

    def closeStream(self, stream):
        self.stream_closed = True

    def readStream(self, stream, buffs, num_elems, timeoutUs=0):
        call = self.read_calls
        self.read_calls += 1
        if call in self._inject:
            return _StreamResult(self._inject.pop(call))
        if not self.stream_active:
            return _StreamResult(-2)
        if self._total is not None and self._cursor >= self._total:
            return _StreamResult(SOAPY_SDR_TIMEOUT)
        n = int(num_elems)
        if self._short_read_max is not None:
            n = min(n, self._short_read_max)
        if self._total is not None:
            n = min(n, self._total - self._cursor)
        if self._synth is not None:
            chunk = self._synth(self._cursor, n, self._rate)
        else:
            chunk = 0.01 * _stateless_noise(self._cursor + np.arange(n))
        buffs[0][:n] = chunk.astype(np.complex64)
        self._cursor += n
        return _StreamResult(n)


def make_fake_soapy(**device_kwargs) -> types.ModuleType:
    """Build a module standing in for `import SoapySDR`.

    Device(args) returns a FakeDevice configured with device_kwargs; the
    module records every constructed device in `module.devices`.
    """
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = SOAPY_SDR_RX
    mod.SOAPY_SDR_TIMEOUT = SOAPY_SDR_TIMEOUT
    mod.devices = []

    class Device(FakeDevice):
        _enumerate_results = device_kwargs.pop("enumerate_results", [])

        def __init__(self, args):
            super().__init__(args, **device_kwargs)
            mod.devices.append(self)

        @staticmethod
        def enumerate(args=""):
            return list(Device._enumerate_results)

    mod.Device = Device
    return mod


def _stateless_noise(idx: np.ndarray) -> np.ndarray:
    """Unit complex Gaussian noise addressed BY SAMPLE INDEX (hash-uniform +
    Box-Muller), so the stream is identical however reads are chunked."""

    def uniform(salt: float) -> np.ndarray:
        x = np.sin(idx * 12.9898 + salt) * 43758.5453
        return x - np.floor(x)

    u1 = np.clip(uniform(1.0), 1e-7, 1.0)
    u2 = uniform(2.0)
    r = np.sqrt(-2.0 * np.log(u1))
    return (r * np.cos(2 * np.pi * u2) + 1j * r * np.sin(2 * np.pi * u2)).astype(
        np.complex64
    )


def fm_synth(shift_hz: float, key_from_s: float, key_to_s: float, amplitude=0.4):
    """Deterministic noise + keyed NFM signal generator for FakeDevice.

    Stateless in the cursor so reads are reproducible regardless of chunking
    (the 800 Hz audio term integrates in closed form; noise is index-hashed).
    """

    def synth(cursor: int, n: int, rate: float) -> np.ndarray:
        idx = cursor + np.arange(n)
        t = idx / rate
        iq = 0.01 * _stateless_noise(idx)
        audio_int = (1 - np.cos(2 * np.pi * 800 * t)) / (2 * np.pi * 800)
        phase = 2 * np.pi * shift_hz * t + 2 * np.pi * 3000 * audio_int
        keyed = (t >= key_from_s) & (t < key_to_s)
        return (iq + amplitude * np.exp(1j * phase) * keyed).astype(np.complex64)

    return synth
