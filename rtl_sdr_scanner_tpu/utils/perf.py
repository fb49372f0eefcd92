"""Runtime performance counters.

Reference: sources/performance_logger.cpp (frame counter logging average frame
time + fps every N frames at debug level). Extended with a samples/s counter
for the TPU pipeline (SURVEY.md section 5 tracing equivalent).
"""

from __future__ import annotations

import time

from rtl_sdr_scanner_tpu.constants import DEFAULT, Tunables
from rtl_sdr_scanner_tpu.utils import logger


class PerformanceLogger:
    """Counts frames; every `interval` kicks logs avg frame time + fps
    (reference performance_logger.cpp:7-22)."""

    def __init__(self, label: str, tunables: Tunables = DEFAULT):
        self._label = label
        self._interval = tunables.performance_logger_interval
        self._count = 0
        self._last = time.monotonic()

    def kick(self) -> None:
        self._count += 1
        if self._count % self._interval == 0:
            now = time.monotonic()
            elapsed = now - self._last
            frame_ms = 1000.0 * elapsed / self._interval
            fps = self._interval / elapsed if elapsed > 0 else float("inf")
            logger.debug(self._label, "avg frame time: {:.3f} ms, fps: {:.1f}", frame_ms, fps)
            self._last = now


class ThroughputMeter:
    """Samples/s meter for the device pipeline (TPU-native addition)."""

    def __init__(self, label: str, log_every_s: float = 5.0):
        self._label = label
        self._log_every_s = log_every_s
        self._samples = 0
        self._t0 = time.monotonic()
        self._last_log = self._t0

    def add(self, samples: int) -> None:
        self._samples += samples
        now = time.monotonic()
        if now - self._last_log >= self._log_every_s:
            rate = self._samples / (now - self._t0)
            logger.debug(self._label, "throughput: {:.3f} Msamples/s", rate / 1e6)
            self._last_log = now

    def rate(self) -> float:
        elapsed = time.monotonic() - self._t0
        return self._samples / elapsed if elapsed > 0 else 0.0
