"""General host helpers.

Behavioral parity targets: reference sources/utils/utils.cpp (sliding average,
rounding, time, random hash).
"""

from __future__ import annotations

import time
import uuid

import numpy as np


def get_time_ms() -> int:
    """Epoch milliseconds (reference utils.cpp:14)."""
    return int(time.time() * 1000)


def generate_random_hash() -> str:
    """Random instance id: uuid4 hex without dashes (reference utils.cpp:24-29)."""
    return uuid.uuid4().hex


def sliding_average(data: np.ndarray, group_size: int) -> np.ndarray:
    """Sliding-window mean over the last axis with edge-shrinking windows.

    output[i] = mean(data[max(0, i-a) : min(n, i+a+1)]) with a = group_size//2
    (reference utils.cpp:31-53 `average`; golden-tested against
    tests/test_utils.cpp:4-13 expectations).

    Vectorized via cumulative sums; works on any trailing-axis layout.
    """
    data = np.asarray(data, dtype=np.float64)
    n = data.shape[-1]
    a = group_size // 2
    # prefix[..., k] = sum of first k elements
    prefix = np.concatenate(
        [np.zeros(data.shape[:-1] + (1,), dtype=np.float64), np.cumsum(data, axis=-1)],
        axis=-1,
    )
    idx = np.arange(n)
    lo = np.maximum(0, idx - a)
    hi = np.minimum(n, idx + a + 1)
    sums = prefix[..., hi] - prefix[..., lo]
    counts = (hi - lo).astype(np.float64)
    return (sums / counts).astype(np.float32)


def round_up(value: int, factor: int) -> int:
    """Round up to a multiple of factor (reference utils.cpp:55-61)."""
    if value % factor == 0:
        return value
    return (value // factor + 1) * factor


def round_down(value: int, factor: int) -> int:
    """Round down to a multiple of factor (reference utils.cpp:63)."""
    return value // factor * factor
