"""Power-spectral-density frame transform (device side).

Replaces the reference's hot chain
  stream_to_vector -> Decimator -> fft_v(hamming, shift) -> PSD
(sources/radio/sdr_device.cpp:161-165, sources/radio/blocks/psd.cpp:11-22,
sources/radio/blocks/decimator.h:5-26) with a single fused JAX transform over
a batch of frames: frame-select, window, FFT, fftshift, 10*log10(|X|^2/rate).

Design notes (TPU):
- frames are batched [n_frames, fft]; XLA fuses window-multiply and the
  magnitude/log elementwise tail around its native FFT.
- IQ may arrive as int8 (cs8) to quarter host->device bandwidth; dequant
  happens on device inside the same jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.window import hamming

# Floor |X|^2 at a tiny epsilon so log10 of an exactly-zero bin stays finite
# (the C++ reference produces -inf there; downstream max-holds make the
# distinction irrelevant, but NaN/inf propagation under XLA is worth avoiding).
_EPS = 1e-30


def dequantize_cs8(iq_int8: jnp.ndarray) -> jnp.ndarray:
    """int8 interleaved IQ [..., 2] -> complex64, scale 1/127.5.

    Matches scripts/converter.py:30-33 (cs8 replay convention).
    """
    x = iq_int8.astype(jnp.float32) / 127.5
    return jax.lax.complex(x[..., 0], x[..., 1])


def pairs_to_complex(iq_f32: jnp.ndarray) -> jnp.ndarray:
    """float32 interleaved IQ [..., 2] -> complex64.

    The host never transfers complex64: cf32 captures are uploaded as their
    f32 (re, im) pair view (free reinterpret on the host) and combined on
    device. (Also required on the axon tunnel, where complex64 h2d/d2h is
    unimplemented.)
    """
    return jax.lax.complex(iq_f32[..., 0], iq_f32[..., 1])


def frame_blocks(iq: jnp.ndarray, fft_size: int, decimator_factor: int) -> jnp.ndarray:
    """[n*fft*decim] complex -> [n, fft]: first fft samples of each group.

    This IS the reference Decimator (decimator.h:11-22): frame dropping to cap
    detection at SIGNAL_DETECTION_FPS, not sample filtering.
    """
    group = fft_size * decimator_factor
    n = iq.shape[0] // group
    return iq[: n * group].reshape(n, group)[:, :fft_size]


def psd_frames(frames: jnp.ndarray, sample_rate: float, window: np.ndarray | None = None) -> jnp.ndarray:
    """[n, fft] complex64 -> [n, fft] float32 PSD in dB, fftshifted.

    out = 10*log10(|FFT(frame*hamming)|^2 / sample_rate), bins centered on DC
    (reference psd.cpp:19 + fft_v hamming/shift at sdr_device.cpp:164).

    The fftshift is folded into the window: FFT(x * (-1)^n)[k] =
    FFT(x)[(k + N/2) mod N] for even N, so multiplying the (already applied)
    window by the alternating sign makes the output permutation free --
    no post-FFT roll of the complex spectrum through HBM.
    """
    fft_size = frames.shape[-1]
    if window is None:
        window = hamming(fft_size)
    if fft_size % 2 == 0:
        signs = np.where(np.arange(fft_size) % 2 == 0, 1.0, -1.0).astype(np.float32)
        spec = jnp.fft.fft(frames * (window * signs))
    else:
        spec = jnp.fft.fftshift(jnp.fft.fft(frames * window), axes=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return (10.0 * jnp.log10(jnp.maximum(power, _EPS) / sample_rate)).astype(jnp.float32)
