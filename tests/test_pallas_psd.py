"""Pallas fused PSD kernel vs the XLA reference chain (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.pallas.psd_kernel import _split_n, psd_frames_int8_pallas
from rtl_sdr_scanner_tpu.ops.psd import dequantize_cs8, frame_blocks, psd_frames


def test_split_n():
    assert _split_n(1024) == (32, 32)
    assert _split_n(8192) == (128, 64)
    assert _split_n(131072) == (512, 256)


def test_pallas_psd_matches_reference_chain():
    fft, decim, frames = 1024, 3, 4
    rate = 256000.0
    rng = np.random.default_rng(0)
    iq_int8 = rng.integers(-100, 100, size=(frames, fft * decim, 2), dtype=np.int8)

    got = np.asarray(
        psd_frames_int8_pallas(jnp.asarray(iq_int8), rate, fft, decim, interpret=True)
    )

    iq = dequantize_cs8(jnp.asarray(iq_int8))
    ref = np.asarray(psd_frames(frame_blocks(iq.reshape(-1), fft, decim), rate))

    assert got.shape == ref.shape
    # four-step f32 matmul FFT vs radix FFT: small numeric differences in dB
    np.testing.assert_allclose(got, ref, atol=0.02)
