"""Frequency-domain sliding average (device side).

Replaces the reference's `average` free function (sources/utils/utils.cpp:31-53)
applied per detection frame at GROUPING_X=21 bins (transmission.cpp:61):
out[i] = mean(x[max(0,i-a) : min(n,i+a+1)]), a = group//2 -- edge windows
shrink.

Implemented with a cumulative sum + two shifted SLICES (edge windows clamp to
the first/last prefix element): O(n), no gathers -- arbitrary-index gathers
are scalar-slow on TPU and dominated the scan step -- fuses cleanly under
XLA, and works batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sliding_average(x: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Edge-shrinking boxcar over the last axis (float32 out)."""
    n = x.shape[-1]
    a = group_size // 2
    prefix = jnp.cumsum(x.astype(jnp.float32), axis=-1)
    zeros = jnp.zeros(x.shape[:-1] + (1,), dtype=jnp.float32)
    prefix = jnp.concatenate([zeros, prefix], axis=-1)  # [..., n+1]
    # hi = prefix[min(n, i+a+1)] : slice shifted left by a+1, clamped at the
    # last element; lo = prefix[max(0, i-a)] : slice shifted right by a,
    # clamped at prefix[0] == 0.
    last = prefix[..., -1:]
    hi = jnp.concatenate(
        [prefix[..., a + 1 :], jnp.broadcast_to(last, x.shape[:-1] + (a,))], axis=-1
    )
    lo = jnp.concatenate([jnp.broadcast_to(zeros, x.shape[:-1] + (a,)), prefix[..., : n - a]], axis=-1)
    idx = np.arange(n)
    counts = jnp.asarray(
        (np.minimum(n, idx + a + 1) - np.maximum(0, idx - a)).astype(np.float32)
    )
    return (hi - lo) / counts
