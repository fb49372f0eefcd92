"""Recording fidelity vs the reference resampler chain (round-3 verdict #3).

BASELINE.md's correctness axis requires "recordings within reference SNR
bound". The reference records through gr rational_resampler stages whose
default filter is a Kaiser(beta=7) windowed sinc designed by
design_resampler_filter (fractional_bw 0.4) -- reference recorder.cpp:29-36,
and ops/ddc.py reimplements that exact design formula. GNU Radio itself is
not installable here, so fidelity is pinned two ways:

1. measured FILTER-SPEC assertions on the designed taps for every (L, M)
   stage pair in the reference's typical-rates table
   (test_radio_utils.cpp:37-69): passband ripple, stopband attenuation at
   the design's own edges, and alias-image rejection. A Kaiser beta=7
   design yields ~70 dB stopband; the specs assert conservative floors so
   a design regression (wrong cutoff/transition/window) fails loudly.
2. END-TO-END SNR through the production DDC chain (exact NCO + cascaded
   polyphase stages + int8 x127 wire quantization) against the ANALYTIC
   ideal output for a multitone band-limited signal. The int8 wire format
   -- identical to the reference's (data_controller.cpp:27-42) -- floors
   the achievable SNR near ~46 dB; asserting >= 40 dB proves the chain's
   filtering/NCO error sits below the reference's own quantization floor,
   i.e. recordings match the reference within ITS wire SNR bound.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rtl_sdr_scanner_tpu.ops.ddc import (
    chain_block_multiple,
    ddc_chunk,
    design_resampler_taps,
    init_ddc_state,
    make_nco_tables,
    plan_chain,
)
from rtl_sdr_scanner_tpu.utils.radio_utils import get_resamplers_factors

# every stage pair the reference's typical configurations produce
# (test_radio_utils.cpp:37-69; tests/test_radio_utils.py)
STAGE_PAIRS = sorted(
    {
        pair
        for rate in (1000000, 1024000, 2000000, 2048000, 10000000, 10240000,
                     20000000, 20480000)
        for bw in (16000, 20000)
        for pair in get_resamplers_factors(rate, bw, 125)
    }
)


def _freq_response(taps: np.ndarray, n_fft: int = 1 << 18) -> np.ndarray:
    """|H(f)| over [0, 0.5) of the filter's own sampling rate."""
    h = np.fft.rfft(taps, n_fft)
    return np.abs(h)


@pytest.mark.parametrize("interp,decim", STAGE_PAIRS)
def test_stage_filter_specs(interp, decim):
    """GR design_resampler_filter geometry, in filter-rate units (the filter
    runs at interp * fs_in): passband edge 0.4 and stop edge 0.5 of the
    OUTPUT Nyquist, transition width 0.1 of it. Floors are calibrated to the
    measured characteristics of the reference design itself (identical
    across every (L, M) pair): ~0.17 dB passband edge droop, ~34.5 dB at the
    nominal stop edge (the ntaps heuristic realizes a wider transition than
    nominal), ~77 dB half a transition width past it, ~81 dB at the first
    alias image. A design regression (wrong cutoff, transition, window beta,
    tap count) breaks these floors loudly."""
    taps = design_resampler_taps(interp, decim)
    rate_ratio = interp / decim
    n_fft = 1 << 18
    mag = _freq_response(taps, n_fft)
    f = np.arange(mag.size) / n_fft  # cycles per filter-rate sample
    # design edges (ops/ddc.py design_resampler_taps), normalized by the
    # filter sampling rate interp
    scaled = min(rate_ratio, 1.0)
    pass_edge = 0.4 * scaled / interp
    stop_edge = 0.5 * scaled / interp
    tw = 0.1 * scaled / interp
    dc = mag[0]
    assert dc == pytest.approx(interp, rel=1e-6)  # DC gain = interp (GR)

    passband = mag[f <= pass_edge] / dc
    ripple_db = 20 * np.log10(passband.max()) - 20 * np.log10(passband.min())
    assert ripple_db < 0.3, f"passband ripple {ripple_db:.3f} dB"

    edge_db = -20 * np.log10(mag[f >= stop_edge].max() / dc + 1e-300)
    assert edge_db >= 30.0, f"stop-edge attenuation {edge_db:.1f} dB"
    deep_db = -20 * np.log10(mag[f >= stop_edge + tw / 2].max() / dc + 1e-300)
    assert deep_db >= 70.0, f"stopband attenuation {deep_db:.1f} dB"

    # alias images: content at k*(output rate) +- g (g in the passband) folds
    # onto the passband after decimation; every image must be deeply rejected
    out_rate = 1.0 / decim  # output rate in filter-rate units
    k = 1
    while True:
        lo = k * out_rate - pass_edge
        hi = min(k * out_rate + pass_edge, 0.5)
        if lo >= 0.5:
            break
        img = mag[(f >= lo) & (f <= hi)] / dc
        if img.size:
            rej_db = -20 * np.log10(img.max() + 1e-300)
            assert rej_db >= 70.0, f"image {k} rejection {rej_db:.1f} dB"
        k += 1


def _chain_snr(rate: int, bandwidth: int, shift: int, seed: int = 0):
    """Run the production DDC on a multitone band-limited signal; return
    (per-tone gain error dB max, residual SNR dB) vs the analytic ideal."""
    plans = plan_chain(rate, bandwidth)
    mult = chain_block_multiple(plans)
    chunk = mult * max(1, 65536 // mult)
    n_chunks = max(6, (rate // 2) // chunk + 1)  # >= 0.5 s of input
    total = chunk * n_chunks

    rng = np.random.default_rng(seed)
    # tones inside the recorded band: within +-0.375 * bandwidth (clear of
    # the 0.4 passband edge), amplitudes summing under full scale
    freqs = np.array([-0.36, -0.21, 0.05, 0.17, 0.33]) * bandwidth
    amps = np.array([0.25, 0.12, 0.2, 0.1, 0.18])
    phases = rng.uniform(0, 2 * np.pi, size=freqs.size)

    n = np.arange(total)
    s = np.zeros(total, dtype=np.complex128)
    for a, fk, ph in zip(amps, freqs, phases):
        s += a * np.exp(1j * (2 * np.pi * fk * n / rate + ph))
    iq = (np.exp(2j * np.pi * shift * n / rate) * s).astype(np.complex64)

    state = init_ddc_state(plans, num_slots=1)
    tables = make_nco_tables(np.array([shift]), rate, chunk)
    outs = []
    for b in range(n_chunks):
        state, out = ddc_chunk(
            jnp.asarray(iq[b * chunk : (b + 1) * chunk]), state, tables, plans
        )
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)[0]  # [n_out, 2] int8
    out = (got[:, 0].astype(np.float64) + 1j * got[:, 1].astype(np.float64)) / 127.0

    # settled region (skip cascaded filter warmup: first quarter)
    n_out = out.size
    sl = slice(n_out // 4, n_out)
    m = np.arange(n_out)[sl]
    out_s = out[sl]
    # LS fit of per-tone complex gains over the settled region
    a_mat = np.stack(
        [np.exp(1j * (2 * np.pi * fk * m / bandwidth + ph)) for fk, ph in zip(freqs, phases)],
        axis=1,
    )
    g, *_ = np.linalg.lstsq(a_mat, out_s, rcond=None)
    ideal = a_mat @ g
    resid = out_s - ideal
    snr_db = 10 * np.log10(np.vdot(ideal, ideal).real / np.vdot(resid, resid).real)
    gain_err_db = np.abs(20 * np.log10(np.abs(g) / amps))
    return gain_err_db.max(), snr_db


@pytest.mark.parametrize(
    "rate,bandwidth,shift",
    [
        (2048000, 16000, 250000),
        (20480000, 16000, -3517000),
        # 1.024 Msps -> 20 kHz runs (1,16),(5,16): exercises an INTERP
        # (polyphase upsampling) stage end to end, not just decimators
        (1024000, 20000, 120000),
    ],
)
def test_end_to_end_recording_snr(rate, bandwidth, shift):
    """The whole recording chain (NCO shift + cascaded GR-design polyphase
    stages + int8 x127 wire format) reproduces a band-limited multitone
    within the reference's own wire quantization floor: per-tone gain flat
    to < 0.5 dB, residual SNR >= 40 dB (int8 full-scale floor ~46 dB)."""
    gain_err_db, snr_db = _chain_snr(rate, bandwidth, shift)
    assert gain_err_db < 0.5, f"passband gain error {gain_err_db:.2f} dB"
    assert snr_db >= 40.0, f"end-to-end SNR {snr_db:.1f} dB"
