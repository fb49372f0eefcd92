"""Modulated-taps DDC (ops/ddc.py v2) equivalence vs the exact-NCO v1 path.

v2 folds the rotation into complex stage-1 taps and rotates at the decimated
rate (recorder.cpp:64 rotator + rational_resampler cascade, restructured for
HBM traffic). Identity: sum_j h[j] x[mM-j] e^{i phi(mM-j)}
= e^{i phi(mM)} sum_j (h[j] e^{-i inc j}) x[mM-j] -- bit-level differences
are float-associativity only, so int8 outputs must match within 1 LSB.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig
from rtl_sdr_scanner_tpu.ops.ddc import (
    ddc_chunk,
    ddc_chunk_modtap,
    init_ddc2_state,
    init_ddc_state,
    make_mod_tables,
    make_nco_tables,
    reset_slot2,
)

RATE = 2_048_000
BW = 16000
K = 2


def _cfg(block):
    cfg = DdcConfig.create(RATE, BW, K, block)
    assert cfg.modtap, "test geometry must hit the modtap path"
    return cfg


def _run_v1(cfg, iq, shifts, n_chunks):
    state = init_ddc_state(cfg.plans, K)
    tables = make_nco_tables(shifts, RATE, cfg.chunk)
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk(
            jnp.asarray(iq[b * cfg.chunk : (b + 1) * cfg.chunk]), state, tables, cfg.plans
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


def _run_v2(cfg, iq, shifts, n_chunks, reset_at=None):
    state = jax.tree.map(lambda a: a[None], init_ddc2_state(cfg.plans, K))
    tables = jax.tree.map(
        lambda a: a[None], make_mod_tables(cfg.plans, shifts, RATE, cfg.chunk)
    )
    outs = []
    for b in range(n_chunks):
        if reset_at is not None and b == reset_at:
            inner = jax.tree.map(lambda a: a[0], state)
            state = jax.tree.map(lambda a: a[None], reset_slot2(inner, 0))
        state, out = ddc_chunk_modtap(
            jnp.asarray(iq[None, b * cfg.chunk : (b + 1) * cfg.chunk]),
            state,
            tables,
            cfg.plans,
        )
        outs.append(np.asarray(out)[0])
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("shifts", [[250_000, -771_300], [2_500, 1_023_999]])
def test_modtap_matches_exact_nco(shifts):
    cfg = _cfg(1 << 16)
    n_chunks = 3
    rng = np.random.default_rng(11)
    n = cfg.chunk * n_chunks
    iq = 0.5 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    shifts = np.asarray(shifts, dtype=np.int64)
    ref = _run_v1(cfg, iq, shifts, n_chunks)
    got = _run_v2(cfg, iq, shifts, n_chunks)
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_modtap_int8_input_and_phase_continuity():
    """cs8 input path + many chunks (phase wraps repeatedly)."""
    cfg = _cfg(1 << 15)
    n_chunks = 6
    rng = np.random.default_rng(5)
    n = cfg.chunk * n_chunks
    raw = rng.integers(-100, 100, size=(n, 2), dtype=np.int8)
    iq = (raw[:, 0].astype(np.float32) + 1j * raw[:, 1].astype(np.float32)) / 127.5
    iq = iq.astype(np.complex64)
    shifts = np.asarray([333_333, -100_000], dtype=np.int64)

    ref = _run_v1(cfg, iq, shifts, n_chunks)

    state = jax.tree.map(lambda a: a[None], init_ddc2_state(cfg.plans, K))
    tables = jax.tree.map(
        lambda a: a[None], make_mod_tables(cfg.plans, shifts, RATE, cfg.chunk)
    )
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk_modtap(
            jnp.asarray(raw[None, b * cfg.chunk : (b + 1) * cfg.chunk]),
            state,
            tables,
            cfg.plans,
        )
        outs.append(np.asarray(out)[0])
    got = np.concatenate(outs, axis=1)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1


def test_modtap_reset_slot_steady_state():
    """reset_slot2 zeroes phase + late-stage tails; after the documented
    stage-1 transient (shared raw history instead of zeros) the reset slot
    matches a fresh v1 slot exactly, and the OTHER slot is untouched."""
    cfg = _cfg(1 << 16)
    rng = np.random.default_rng(7)
    n_chunks = 4
    n = cfg.chunk * n_chunks
    iq = 0.5 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    shifts = np.asarray([250_000, -500_000], dtype=np.int64)

    got = _run_v2(cfg, iq, shifts, n_chunks, reset_at=2)

    # oracle for the reset slot: v1 stream started at the reset point
    cfg1 = cfg
    state = init_ddc_state(cfg1.plans, K)
    tables = make_nco_tables(shifts, RATE, cfg1.chunk)
    outs = []
    for b in range(2, n_chunks):
        state, out = ddc_chunk(
            jnp.asarray(iq[b * cfg.chunk : (b + 1) * cfg.chunk]), state, tables, cfg1.plans
        )
        outs.append(np.asarray(out))
    ref_tail = np.concatenate(outs, axis=1)

    out_per_chunk = got.shape[1] // n_chunks
    got_tail = got[:, 2 * out_per_chunk :]
    # skip the stage-1+2 transient (shared-history divergence, bounded by the
    # chain's total input-domain memory)
    skip = 64
    diff = np.abs(
        got_tail[0, skip:].astype(np.int32) - ref_tail[0, skip:].astype(np.int32)
    )
    assert diff.max() <= 1

    # slot 1 is untouched by slot 0's reset
    ref_full = _run_v1(cfg, iq, shifts, n_chunks)
    diff1 = np.abs(got[1].astype(np.int32) - ref_full[1].astype(np.int32))
    assert diff1.max() <= 1
