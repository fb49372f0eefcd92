"""Frequency-domain sliding average (device side).

Replaces the reference's `average` free function (sources/utils/utils.cpp:31-53)
applied per detection frame at GROUPING_X=21 bins (transmission.cpp:61):
out[i] = mean(x[max(0,i-a) : min(n,i+a+1)]), a = group//2 -- edge windows
shrink.

Implemented as TWO levels of zero-padded shifted-slice adds: width w = p*q
decomposes into width-p partial sums t (p-1 adds) combined at stride p
(q-1 adds) -- exact disjoint spans, no gathers. The flat w-add chain this
replaces is LANE-ROTATION-bound on TPU, not bandwidth-bound: every
shifted slice of the padded row is a lane-misaligned vector read, so 21
adds cost 21 rotations (measured net ~35 ms per 32-band x 45-frame block
on v5e) while the factored form costs p+q-2 = 8 (net ~15 ms, bit-level
diff ~4e-7 from the changed summation order). A banded chunk-matmul form
(MXU does the shifting) and a doubling tree both measured slower (~31 /
~25 ms net; kept for the record in BENCH.md). An earlier cumsum-difference
form was worse still: a 131072-wide minor-axis cumsum lowers to ~17
log-step passes, with large-prefix cancellation on top.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _factor(w: int) -> int:
    """Largest divisor of w that is <= sqrt(w) (1 if w is prime)."""
    best = 1
    for p in range(2, int(w**0.5) + 1):
        if w % p == 0:
            best = p
    return best


def sliding_average(x: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Edge-shrinking boxcar over the last axis (float32 out)."""
    n = x.shape[-1]
    a = group_size // 2
    w = 2 * a + 1
    xf = x.astype(jnp.float32)
    pad_cfg = [(0, 0)] * (x.ndim - 1)
    p = _factor(w)
    if p > 1:
        q = w // p
        # t[i] = sum x[i : i+p]; y[i] = sum_j t[i + j*p] covers [i, i+w)
        padded = jnp.pad(xf, pad_cfg + [(a, a + p)])  # zeros never shift sums
        m = n + (q - 1) * p
        t = padded[..., 0:m]
        for s in range(1, p):
            t = t + padded[..., s : s + m]
        total = t[..., 0:n]
        for j in range(1, q):
            total = total + t[..., j * p : j * p + n]
    else:
        padded = jnp.pad(xf, pad_cfg + [(a, a)])
        total = padded[..., 0:n]
        for s in range(1, w):
            total = total + padded[..., s : s + n]
    idx = np.arange(n)
    counts = jnp.asarray(
        (np.minimum(n, idx + a + 1) - np.maximum(0, idx - a)).astype(np.float32)
    )
    return total / counts
