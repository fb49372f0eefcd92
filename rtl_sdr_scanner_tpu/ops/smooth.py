"""Frequency-domain sliding average (device side).

Replaces the reference's `average` free function (sources/utils/utils.cpp:31-53)
applied per detection frame at GROUPING_X=21 bins (transmission.cpp:61):
out[i] = mean(x[max(0,i-a) : min(n,i+a+1)]), a = group//2 -- edge windows
shrink.

Implemented as group_size zero-padded shifted-slice adds: no gathers
(arbitrary-index gathers are scalar-slow on TPU), and XLA fuses the whole
sum into one pass over the rows. This replaced a cumsum-difference form:
cumsum along a 131072-wide minor axis lowers to ~17 log-step passes and
measured several ms/block slower, and the direct sum is also better
conditioned (no large-prefix cancellation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sliding_average(x: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Edge-shrinking boxcar over the last axis (float32 out)."""
    n = x.shape[-1]
    a = group_size // 2
    xf = x.astype(jnp.float32)
    pad_cfg = [(0, 0)] * (x.ndim - 1)
    padded = jnp.pad(xf, pad_cfg + [(a, a)])  # zeros never shift the sum
    total = padded[..., 0:n]
    for s in range(1, 2 * a + 1):
        total = total + padded[..., s : s + n]
    idx = np.arange(n)
    counts = jnp.asarray(
        (np.minimum(n, idx + a + 1) - np.maximum(0, idx - a)).astype(np.float32)
    )
    return total / counts
