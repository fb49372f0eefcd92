#!/usr/bin/env python3
"""Generate the golden recording vector for tests/test_recording_fidelity.py.

The reference records through gr::filter::rational_resampler stages fed by a
rotator (reference recorder.cpp:29-36: rotator_cc with phase_inc
2*pi*(-shift)/rate, then cascaded rational_resampler stages with factors from
getResamplersFactors, then complex_to_interleaved_char x127). This script
produces ~1 s of that chain's output for ONE configuration and stores it as
tests/golden/recording_2048k_16k_250k.npz; the fidelity test then asserts the
production TPU DDC matches it within the int8 wire SNR bound.

Two generation paths:

- If GNU Radio is importable (run this script on any machine with gnuradio
  installed), the TRUE reference chain is run: gr rotator_cc +
  rational_resampler_ccc stages + complex_to_interleaved_char. `source` in
  the npz records "gnuradio".
- Otherwise (this repo's environment has no gnuradio and no network), an
  INDEPENDENT numpy/scipy model of the same chain is used: taps designed by
  a from-the-spec reimplementation of firdes.low_pass (Kaiser beta 7,
  design_resampler_filter geometry) written against scipy.signal.windows
  + scipy.signal.upfirdn -- sharing NO code with the production
  rtl_sdr_scanner_tpu.ops.ddc path (different window routine, different
  convolution engine, float64 throughout). `source` records "scipy-model".
  This is not byte-for-byte GNU Radio, but it is an independent
  implementation of the same published design equations, so a systematic
  error in the production chain's filter design or polyphase arithmetic
  cannot hide in both.

The input signal is regenerated deterministically by the test from the seed
stored in the npz; only the int8 output rides the repository (~32 KB).

Usage: python scripts/make_golden_recording.py [--out tests/golden/...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RATE = 2_048_000
BANDWIDTH = 16_000
SHIFT = 250_000
SECONDS = 1.0
SEED = 20260821
FRACTIONAL_BW = 0.4
KAISER_BETA = 7.0


def make_input(seed: int = SEED, seconds: float = SECONDS) -> np.ndarray:
    """Deterministic multitone-in-noise test signal at RATE, centered on
    SHIFT (so the recorded band has structured content), complex64 like the
    reference's CF32 stream."""
    n = int(RATE * seconds)
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    iq = 0.003 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    tone_offsets = np.array([-5200.0, -1700.0, 800.0, 3100.0, 5600.0])
    amps = np.array([0.22, 0.11, 0.17, 0.09, 0.13])
    phases = rng.uniform(0.0, 2.0 * np.pi, size=tone_offsets.size)
    for df, a, ph in zip(tone_offsets, amps, phases):
        iq = iq + a * np.exp(1j * (2.0 * np.pi * (SHIFT + df) * t + ph))
    return iq.astype(np.complex64)


# --------------------------------------------------------------------------
# Independent model of the GR chain (scipy path)
# --------------------------------------------------------------------------


def _firdes_low_pass_indep(gain, sampling_freq, cutoff, transition_width):
    """firdes::low_pass from the published GR algorithm, independently:
    Kaiser(beta=7) window from scipy, sinc via np.sinc, tap count from the
    firdes attenuation heuristic, DC-normalized to `gain`."""
    from scipy.signal.windows import kaiser

    attenuation = KAISER_BETA / 0.1102 + 8.7
    ntaps = int(attenuation * sampling_freq / (22.0 * transition_width))
    if ntaps % 2 == 0:
        ntaps += 1
    m = (ntaps - 1) // 2
    n = np.arange(-m, m + 1, dtype=np.float64)
    fc = cutoff / sampling_freq  # cycles/sample
    ideal = 2.0 * fc * np.sinc(2.0 * fc * n)
    taps = ideal * kaiser(ntaps, KAISER_BETA, sym=True)
    return taps * (gain / np.sum(taps))


def _design_stage_taps_indep(interp: int, decim: int) -> np.ndarray:
    """GR rational_resampler design_filter geometry (fractional_bw 0.4)."""
    halfband = 0.5
    rate = interp / decim
    if rate >= 1.0:
        trans = halfband - FRACTIONAL_BW
        mid = halfband - trans / 2.0
    else:
        trans = rate * (halfband - FRACTIONAL_BW)
        mid = rate * halfband - trans / 2.0
    return _firdes_low_pass_indep(interp, interp, mid, trans)


def generate_scipy_model(iq: np.ndarray) -> np.ndarray:
    """Rotator + cascaded rational resampler stages + int8 wire quantize,
    float64 throughout, convolution via scipy.signal.upfirdn (zero initial
    state, like a freshly-started streaming chain)."""
    from scipy.signal import upfirdn

    from rtl_sdr_scanner_tpu.utils.radio_utils import get_resamplers_factors

    n = np.arange(iq.size, dtype=np.float64)
    y = iq.astype(np.complex128) * np.exp(-2j * np.pi * SHIFT * n / RATE)
    for interp, decim in get_resamplers_factors(RATE, BANDWIDTH, 125):
        taps = _design_stage_taps_indep(interp, decim)
        y = upfirdn(taps, y, up=interp, down=decim)
    out = np.empty((y.size, 2), dtype=np.int8)
    out[:, 0] = np.clip(np.round(y.real * 127.0), -128, 127).astype(np.int8)
    out[:, 1] = np.clip(np.round(y.imag * 127.0), -128, 127).astype(np.int8)
    return out


# --------------------------------------------------------------------------
# True GNU Radio chain (when importable)
# --------------------------------------------------------------------------


def generate_gnuradio(iq: np.ndarray) -> np.ndarray:
    """The reference's actual blocks (recorder.cpp:29-36): rotator_cc with
    phase_inc 2*pi*(-shift)/rate, rational_resampler_ccc per factor pair,
    complex_to_interleaved_char scale 127."""
    from gnuradio import blocks, filter as gr_filter, gr

    from rtl_sdr_scanner_tpu.utils.radio_utils import get_resamplers_factors

    tb = gr.top_block()
    src = blocks.vector_source_c(iq.tolist(), repeat=False)
    head = src
    rot = blocks.rotator_cc(2.0 * np.pi * (-SHIFT) / RATE)
    tb.connect(head, rot)
    head = rot
    for interp, decim in get_resamplers_factors(RATE, BANDWIDTH, 125):
        rs = gr_filter.rational_resampler_ccc(interpolation=interp, decimation=decim)
        tb.connect(head, rs)
        head = rs
    conv = blocks.complex_to_interleaved_char(False, 127.0)
    sink = blocks.vector_sink_b()
    tb.connect(head, conv)
    tb.connect(conv, sink)
    tb.run()
    data = np.array(sink.data(), dtype=np.int8)
    return data.reshape(-1, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).resolve().parent.parent
            / "tests"
            / "golden"
            / "recording_2048k_16k_250k.npz"
        ),
    )
    args = ap.parse_args()

    iq = make_input()
    try:
        out = generate_gnuradio(iq)
        source = "gnuradio"
    except ImportError:
        out = generate_scipy_model(iq)
        source = "scipy-model"

    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        out=out,
        source=np.array(source),
        rate=np.array(RATE),
        bandwidth=np.array(BANDWIDTH),
        shift=np.array(SHIFT),
        seed=np.array(SEED),
        seconds=np.array(SECONDS),
    )
    print(f"golden written: {path} source={source} out={out.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
