"""DDC numerics: GR-style filter design, streaming==offline equivalence,
and end-to-end tone-shift correctness."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.ddc import (
    DdcState,
    chain_block_multiple,
    chain_output_length,
    ddc_chunk,
    design_resampler_taps,
    init_ddc_state,
    make_nco_tables,
    plan_chain,
    plan_stage,
    reset_slot,
)

RNG = np.random.default_rng(7)


def _offline_resample(x: np.ndarray, plans) -> np.ndarray:
    """Causal zero-stuffed FIR reference model (complex128)."""
    y = x.astype(np.complex128)
    for p in plans:
        taps = design_resampler_taps(p.interp, p.decim)
        up = np.zeros(len(y) * p.interp, dtype=np.complex128)
        up[:: p.interp] = y
        full = np.convolve(up, taps)
        n_out = len(y) * p.interp // p.decim
        y = full[: n_out * p.decim : p.decim]
    return y


def test_filter_design_dc_gain_and_shape():
    taps = design_resampler_taps(1, 8)
    assert len(taps) % 2 == 1
    np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-9)  # DC gain == interp
    taps5 = design_resampler_taps(5, 16)
    np.testing.assert_allclose(taps5.sum(), 5.0, rtol=1e-9)


def test_chain_block_multiple():
    plans = plan_chain(20480000, 16000)  # stages (1,32),(1,40)
    assert [(p.interp, p.decim) for p in plans] == [(1, 32), (1, 40)]
    m = chain_block_multiple(plans)
    assert m == 1280
    assert chain_output_length(plans, 1280 * 3) == 3


def test_streaming_equals_offline_decim_only():
    plans = plan_chain(1024000, 16000)  # (1, 64)
    chunk = chain_block_multiple(plans) * 64  # 4096 samples
    n_chunks = 4
    x = (RNG.standard_normal(chunk * n_chunks) + 1j * RNG.standard_normal(chunk * n_chunks)).astype(
        np.complex64
    )

    state = init_ddc_state(plans, num_slots=1)
    tables = make_nco_tables(np.array([0]), 1024000, chunk)
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk(jnp.asarray(x[b * chunk : (b + 1) * chunk]), state, tables, plans)
        outs.append(np.asarray(out)[0])  # slot 0
    got = np.concatenate(outs, axis=0)  # [n_out, 2] int8

    ref = _offline_resample(x, plans)
    ref_int8 = np.clip(
        np.round(np.stack([ref.real, ref.imag], -1) * 127.0), -128, 127
    ).astype(np.int8)
    # int8 rounding boundaries can flip by 1 LSB due to f32-vs-f64 paths
    diff = np.abs(got.astype(np.int32) - ref_int8.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_streaming_equals_offline_interp_stage():
    plans = [plan_stage(5, 16)]
    chunk = chain_block_multiple(plans) * 50
    n_chunks = 3
    x = (RNG.standard_normal(chunk * n_chunks) + 1j * RNG.standard_normal(chunk * n_chunks)).astype(
        np.complex64
    )
    state = init_ddc_state(plans, num_slots=1)
    tables = make_nco_tables(np.array([0]), 1024000, chunk)
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk(jnp.asarray(x[b * chunk : (b + 1) * chunk]), state, tables, plans)
        outs.append(np.asarray(out)[0])
    got = np.concatenate(outs, axis=0)

    ref = _offline_resample(x, plans)
    ref_int8 = np.clip(np.round(np.stack([ref.real, ref.imag], -1) * 127.0), -128, 127).astype(
        np.int8
    )
    diff = np.abs(got.astype(np.int32) - ref_int8.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_tone_shift_to_baseband():
    """A tone at +shift Hz must come out of slot(shift) as a near-DC tone."""
    rate = 2048000
    bandwidth = 16000
    plans = plan_chain(rate, bandwidth)  # (1,8),(1,16)
    mult = chain_block_multiple(plans)
    chunk = mult * 512  # 65536 samples
    n_chunks = 8
    shift = 250000
    n = np.arange(chunk * n_chunks)
    tone = 0.5 * np.exp(2j * np.pi * shift * n / rate).astype(np.complex64)

    state = init_ddc_state(plans, num_slots=2)
    tables = make_nco_tables(np.array([shift, -100000]), rate, chunk)
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk(jnp.asarray(tone[b * chunk : (b + 1) * chunk]), state, tables, plans)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)  # [slots, n_out, 2]

    # slot 0: tone moved to DC -> constant-ish phasor of magnitude ~0.5*127
    out0 = got[0, :, 0].astype(np.float32) + 1j * got[0, :, 1].astype(np.float32)
    settled = out0[len(out0) // 2 :]  # skip filter warmup
    mag = np.abs(settled)
    np.testing.assert_allclose(mag.mean(), 0.5 * 127, rtol=0.02)
    # spectral purity: dominant bin at DC
    spec = np.abs(np.fft.fft(settled))
    assert np.argmax(spec) == 0

    # slot 1: tone at +250k shifted by +100k -> 350k, far outside the 16 kHz
    # output band -> heavily attenuated
    out1 = got[1, :, 0].astype(np.float32) + 1j * got[1, :, 1].astype(np.float32)
    assert np.abs(out1[len(out1) // 2 :]).mean() < 2.0


def test_reset_slot():
    plans = plan_chain(1024000, 16000)
    state = init_ddc_state(plans, 3)
    state = DdcState(
        phase=state.phase.at[:].set(1.0),
        tails=tuple(t.at[:].set(5.0) for t in state.tails),
    )
    state = reset_slot(state, 1)
    assert float(state.phase[1]) == 0.0
    assert float(state.phase[0]) == 1.0
    assert float(jnp.abs(state.tails[0][1]).max()) == 0.0
    assert float(jnp.abs(state.tails[0][0]).max()) == 5.0
