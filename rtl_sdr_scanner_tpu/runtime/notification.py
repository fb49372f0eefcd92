"""Single-slot blocking mailbox (reference sources/notification.h:7-32).

notify() overwrites the stored value; wait() blocks until a value is present
and consumes it. Producer: the detection pipeline; consumer: the scanner
worker. Retained for API parity with the reference runtime shape -- the
synchronous replay path short-circuits it.
"""

from __future__ import annotations

import threading
from typing import Generic, Optional, TypeVar

T = TypeVar("T")


class Notification(Generic[T]):
    def __init__(self):
        self._cond = threading.Condition()
        self._value: Optional[T] = None
        self._has_value = False

    def notify(self, value: T) -> None:
        with self._cond:
            self._value = value
            self._has_value = True
            self._cond.notify()

    def wait(self, timeout: Optional[float] = None) -> Optional[T]:
        with self._cond:
            if not self._has_value:
                self._cond.wait(timeout=timeout)
            if not self._has_value:
                return None
            value = self._value
            self._value = None
            self._has_value = False
            return value
