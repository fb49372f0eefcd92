"""_two_stage_top_k / _pooled_top_k must equal lax.top_k exactly, including
tie ordering, and _margin_separated_top must match a numpy greedy model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.ops.detect import (
    _margin_separated_top,
    _pooled_top_k,
    _two_stage_top_k,
)

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


@pytest.mark.parametrize("case", ["random", "ties", "all_equal", "sentinel", "masked"])
def test_pooled_top_k_equals_single_topk(case):
    shape, k = (3, 131072), 64
    n = shape[-1]
    rows = RNG.standard_normal(shape).astype(np.float32)
    if case == "ties":
        # same value scattered within one pool cell, across cells, across
        # segment boundaries -- first-index order must survive the prefilter
        for pos in (5, 6, 700, 701, 8191, 8192, 65536, n - 3):
            rows[..., pos] = 4.444
    elif case == "all_equal":
        rows[...] = -100.0  # the reference NO_DATA sentinel everywhere
    elif case == "sentinel":
        rows[0, :] = -100.0
    elif case == "masked":
        rows[..., : n // 2] = np.float32(-3.0e38)  # valid_mask fill value
    v2, i2 = _pooled_top_k(jnp.asarray(rows), k)
    v1, i1 = jax.lax.top_k(jnp.asarray(rows), k)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_pooled_top_k_dense_cell_hits():
    # a single pool cell holding MANY true top-k bins must contribute all of
    # them (the gather takes whole cells, not one bin per cell)
    rows = np.full((2, 8192), -50.0, dtype=np.float32)
    rows[:, 4096:4104] = np.float32([10, 9, 8, 7, 6, 5, 4, 3])  # one cell
    rows[:, 100] = 2.0
    v2, i2 = _pooled_top_k(jnp.asarray(rows), 9)
    v1, i1 = jax.lax.top_k(jnp.asarray(rows), 9)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


@pytest.mark.parametrize("k", [3, 4])
def test_margin_separated_ties_first_occurrence(k):
    # equal maxima in different pool cells: greedy must pick the SMALLER bin
    # first (argmax first-occurrence), then suppress and pick the other.
    # k=4 exercises the 2-winners-per-pass segment path (even k, 4096 >= 2
    # segments); k=3 routes to the _margin_separated_top_1per fallback -- the
    # tie rule must hold on both.
    rows = np.full((1, 4096), -60.0, dtype=np.float32)
    rows[0, 900] = rows[0, 2000] = 7.5
    vals, idxs = _margin_separated_top(jnp.asarray(rows), k, 52)
    assert list(np.asarray(idxs)[0][:2]) == [900, 2000]
    np.testing.assert_allclose(np.asarray(vals)[0][:2], [7.5, 7.5])


def test_margin_separated_segment_path_ties_within_pass():
    # equal maxima that must be split ACROSS one 2-winner pass (w1 and w2 of
    # the same pass tied): the segment-table refinement must keep the
    # first-occurrence order, including ties straddling segment boundaries
    rows = np.full((1, 4096), -60.0, dtype=np.float32)
    rows[0, 1023] = rows[0, 1100] = rows[0, 2000] = rows[0, 3000] = 7.5
    vals, idxs = _margin_separated_top(jnp.asarray(rows), 4, 52)
    assert list(np.asarray(idxs)[0]) == [1023, 1100, 2000, 3000]
    np.testing.assert_allclose(np.asarray(vals)[0], [7.5] * 4)


def test_pooled_equals_two_stage_under_ties_midsize():
    # raw lax.top_k is tie-UNSTABLE at some widths (observed n=8192 on the
    # current XLA build); the production contract is pooled == two-stage
    # (first-occurrence tie rule), pinned here on heavy-tie integer rows
    rng = np.random.default_rng(3)
    rows = rng.integers(-50, -40, size=(4, 8192)).astype(np.float32)
    rows[:, ::17] = -42.0  # hundreds of exact ties spread across cells
    v_p, i_p = _pooled_top_k(jnp.asarray(rows), 64)
    v_t, i_t = _two_stage_top_k(jnp.asarray(rows), 64)
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_t))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_t))


def _numpy_greedy_check(rows, k, sub, vals, idxs):
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for f in range(rows.shape[0]):
        cur = rows[f].copy()
        for j in range(k):
            i = int(np.argmax(cur))
            assert idxs[f, j] == i, (f, j, idxs[f, j], i)
            assert np.isclose(vals[f, j], cur[i])
            lo, hi = max(0, i - sub), min(len(cur), i + sub + 1)
            cur[lo:hi] = -3.3e38


def test_margin_separated_matches_numpy_greedy():
    rows = RNG.standard_normal((3, 4096)).astype(np.float32)
    k, sub = 8, 52
    vals, idxs = _margin_separated_top(jnp.asarray(rows), k, sub)
    _numpy_greedy_check(rows, k, sub, vals, idxs)


def test_margin_separated_two_per_pass_boundaries():
    # winners and zones straddling 1024-segment boundaries, consecutive
    # winners in the same segment, and zones clipping at the row edges --
    # the cases the 2-winners-per-pass segment refinement must get exact
    rows = RNG.standard_normal((2, 8192)).astype(np.float32)
    k, sub = 8, 52
    for f, positions in ((0, (1020, 1030, 2048, 2060, 30)), (1, (8191, 8150, 0, 4095, 4100))):
        for p, v in zip(positions, (50.0, 49.0, 48.0, 47.0, 46.0)):
            rows[f, p] = v
    vals, idxs = _margin_separated_top(jnp.asarray(rows), k, sub)
    _numpy_greedy_check(rows, k, sub, vals, idxs)


def test_margin_separated_two_per_pass_randomized():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        rows = rng.standard_normal((2, 8192)).astype(np.float32)
        # sprinkle strong clusters at random positions incl. near boundaries
        for f in range(2):
            pos = rng.integers(0, 8192, size=12)
            rows[f, pos] += rng.uniform(10, 60, size=12).astype(np.float32)
        k, sub = 16, 52
        vals, idxs = _margin_separated_top(jnp.asarray(rows), k, sub)
        _numpy_greedy_check(rows, k, sub, vals, idxs)


def test_margin_separated_all_equal_rows():
    rows = np.full((2, 4096), -100.0, dtype=np.float32)  # NO_DATA sentinel
    vals, idxs = _margin_separated_top(jnp.asarray(rows), 4, 52)
    _numpy_greedy_check(rows, 4, 52, vals, idxs)
