"""Bit-exact parity of the fused Pallas selection kernel (interpret mode)
against the XLA forms it replaces: ops/detect._pooled_top_k,
_margin_separated_top, and the candidate-count reduce."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.ops.detect import (
    _margin_separated_top,
    _pooled_top_k,
)
from rtl_sdr_scanner_tpu.ops.pallas.select_kernel import fused_selection

FFT = 8192
TOP_K = 64
K_SEP = 16
SUBMARGIN = 52
LEVEL = 8.0


def _xla_reference(rows, level, top_k=TOP_K, k_sep=K_SEP, submargin=SUBMARGIN):
    tv, ti = _pooled_top_k(rows, top_k)
    sv, si = _margin_separated_top(rows, k_sep, submargin)
    count = jnp.sum(rows >= jnp.asarray(level, rows.dtype), axis=-1).astype(
        jnp.int32
    )
    return map(np.asarray, (tv, ti, sv, si, count))


def _check(rows, level=LEVEL, **kw):
    rows = jnp.asarray(rows)
    tv, ti, sv, si, count = _xla_reference(rows, level, **kw)
    ptv, pti, psv, psi, pcount = map(
        np.asarray,
        fused_selection(
            rows,
            jnp.float32(level),
            kw.get("top_k", TOP_K),
            kw.get("k_sep", K_SEP),
            kw.get("submargin", SUBMARGIN),
            interpret=True,
        ),
    )
    np.testing.assert_array_equal(pti, ti)
    np.testing.assert_array_equal(ptv, tv)
    np.testing.assert_array_equal(psi, si)
    np.testing.assert_array_equal(psv, sv)
    np.testing.assert_array_equal(pcount, count)


def test_random_rows():
    rng = np.random.default_rng(0)
    rows = rng.normal(0.0, 6.0, size=(5, FFT)).astype(np.float32)
    _check(rows)


def test_tied_and_quantized_rows():
    """Coarse quantization forces many exact ties; the first-occurrence rule
    must match lax.top_k / the greedy across segment boundaries."""
    rng = np.random.default_rng(1)
    rows = np.round(rng.normal(0.0, 3.0, size=(4, FFT))).astype(np.float32)
    _check(rows)


def test_clustered_peaks():
    """Dense clusters around few centers: the margin greedy's suppression
    zones and the top-k must stay distinct."""
    rng = np.random.default_rng(2)
    rows = rng.normal(0.0, 1.0, size=(3, FFT)).astype(np.float32)
    for c in (100, 1023, 1024, 4096, FFT - 1):
        rows[:, max(0, c - 60) : c + 60] += 20.0 * rng.random((3,))[:, None]
    _check(rows)


def test_masked_sentinel_rows():
    """valid_mask fills masked bins with -3.0e38 (compact_detection);
    all-masked rows must produce identical degenerate output."""
    rng = np.random.default_rng(3)
    rows = rng.normal(0.0, 5.0, size=(3, FFT)).astype(np.float32)
    rows[0, :] = -3.0e38  # fully masked row
    rows[1, 2048:] = -3.0e38  # half masked
    _check(rows)


def test_level_at_boundary_and_count():
    rng = np.random.default_rng(4)
    rows = rng.normal(LEVEL, 2.0, size=(2, FFT)).astype(np.float32)
    rows[0, :100] = LEVEL  # exactly at the level: >= counts them
    _check(rows)


def test_bf16_selection_mode():
    """bf16 rows (tolerance mode): selection order and count match the XLA
    forms run on the same bf16 rows."""
    rng = np.random.default_rng(5)
    rows = rng.normal(0.0, 6.0, size=(3, FFT)).astype(np.float32)
    _check(jnp.asarray(rows).astype(jnp.bfloat16))


def test_small_k_and_margin():
    rng = np.random.default_rng(6)
    rows = rng.normal(0.0, 4.0, size=(2, 2048)).astype(np.float32)
    _check(rows, top_k=8, k_sep=4, submargin=17)


def test_vmapped_over_bands():
    """The banded fused step vmaps compact_detection over bands; the kernel
    must compose with vmap (grid dimension lifting)."""
    rng = np.random.default_rng(7)
    rows = rng.normal(0.0, 5.0, size=(3, 4, FFT)).astype(np.float32)

    def one(band_rows):
        return fused_selection(
            band_rows, jnp.float32(LEVEL), 16, 8, SUBMARGIN, interpret=True
        )

    got = jax.vmap(one)(jnp.asarray(rows))
    for b in range(3):
        want = fused_selection(
            jnp.asarray(rows[b]), jnp.float32(LEVEL), 16, 8, SUBMARGIN,
            interpret=True,
        )
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g[b]), np.asarray(w))


def test_compact_detection_pallas_select_end_to_end():
    """compact_detection(pallas_select=True) == compact_detection(False)
    field-for-field (the tunable must be a pure implementation swap)."""
    from rtl_sdr_scanner_tpu.ops.detect import compact_detection

    rng = np.random.default_rng(8)
    f, fft, half_m1 = 5, FFT, 10
    avg = rng.normal(0.0, 5.0, size=(f, fft)).astype(np.float32)
    raw = rng.normal(0.0, 5.0, size=(f, fft)).astype(np.float32)
    prev = rng.normal(0.0, 5.0, size=(half_m1, fft)).astype(np.float32)
    keys = np.array([5, 700, 4000, -1], dtype=np.int32)
    valid = np.ones(fft, dtype=bool)
    valid[:64] = False

    kw = dict(
        keys=jnp.asarray(keys),
        valid_mask=jnp.asarray(valid),
        start_level=jnp.float32(LEVEL),
        group_size=103,
        top_k=32,
    )
    for bf16 in (False, True):
        a = compact_detection(
            jnp.asarray(avg), jnp.asarray(raw), jnp.asarray(prev),
            bf16=bf16, pallas_select=False, **kw,
        )
        b = compact_detection(
            jnp.asarray(avg), jnp.asarray(raw), jnp.asarray(prev),
            bf16=bf16, pallas_select=True, **kw,
        )
        for name in a._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
            )
