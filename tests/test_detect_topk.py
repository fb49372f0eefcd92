"""_two_stage_top_k must equal lax.top_k exactly, including tie ordering,
and _margin_separated_top must match a numpy greedy model."""

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.detect import _margin_separated_top, _two_stage_top_k

RNG = np.random.default_rng(77)


def test_two_stage_equals_single_topk():
    for shape, k in (((4, 8192), 64), ((2, 131072), 64), ((3, 4096), 16)):
        rows = RNG.standard_normal(shape).astype(np.float32)
        # inject ties spread across segments
        n = shape[-1]
        rows[..., 100] = rows[..., n // 2] = rows[..., n - 10] = 3.333
        v2, i2 = _two_stage_top_k(jnp.asarray(rows), k)
        v1, i1 = jax.lax.top_k(jnp.asarray(rows), k)
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_margin_separated_matches_numpy_greedy():
    rows = RNG.standard_normal((3, 4096)).astype(np.float32)
    k, sub = 8, 52
    vals, idxs = _margin_separated_top(jnp.asarray(rows), k, sub)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for f in range(rows.shape[0]):
        cur = rows[f].copy()
        for j in range(k):
            i = int(np.argmax(cur))
            assert idxs[f, j] == i
            assert np.isclose(vals[f, j], cur[i])
            lo, hi = max(0, i - sub), min(len(cur), i + sub + 1)
            cur[lo:hi] = -3.3e38
