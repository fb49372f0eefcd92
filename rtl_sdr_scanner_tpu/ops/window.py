"""Window functions.

The reference detection chain windows each FFT frame with a symmetric Hamming
window (gr::fft::window::hamming, wired at sources/radio/sdr_device.cpp:164).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=32)
def hamming(n: int) -> np.ndarray:
    """Symmetric Hamming window: 0.54 - 0.46 cos(2 pi k / (n-1)).

    Matches GNU Radio's window::hamming (coswindow with a0=0.54, a1=0.46 over
    n-1), which is also numpy.hamming.
    """
    if n == 1:
        return np.ones(1, dtype=np.float32)
    k = np.arange(n, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=32)
def kaiser(n: int, beta: float) -> np.ndarray:
    """Kaiser window (GNU Radio window::kaiser formula == numpy.kaiser).

    Used by the GR-compatible resampler filter design (ops/ddc.py).
    """
    return np.kaiser(n, beta).astype(np.float64)
