"""Frequency-domain sliding average (device side).

Replaces the reference's `average` free function (sources/utils/utils.cpp:31-53)
applied per detection frame at GROUPING_X=21 bins (transmission.cpp:61):
out[i] = mean(x[max(0,i-a) : min(n,i+a+1)]), a = group//2 -- edge windows
shrink.

Implemented with a cumulative sum + two shifted gathers: O(n), fuses cleanly
under XLA, and works batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sliding_average(x: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Edge-shrinking boxcar over the last axis (float32 out)."""
    n = x.shape[-1]
    a = group_size // 2
    prefix = jnp.cumsum(x.astype(jnp.float32), axis=-1)
    prefix = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.float32), prefix], axis=-1
    )
    idx = np.arange(n)
    lo = np.maximum(0, idx - a)
    hi = np.minimum(n, idx + a + 1)
    sums = prefix[..., hi] - prefix[..., lo]
    counts = jnp.asarray((hi - lo).astype(np.float32))
    return sums / counts
