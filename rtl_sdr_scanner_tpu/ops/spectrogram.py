"""Spectrogram bin decimation + accumulation (device side).

Replaces the reference Spectrogram block's per-frame math
(sources/radio/blocks/spectrogram.cpp:45-60): average PSD bins in groups of
decimator_factor down to <= SPECTROGRAM_MAX_FFT bins, accumulate across
frames. The 1 Hz send cadence, per-center-frequency containers, and int8
quantization stay host-side (runtime/spectrogram_sender.py), matching the
reference split between DSP and egress.
"""

from __future__ import annotations

import jax.numpy as jnp

from rtl_sdr_scanner_tpu.utils.radio_utils import get_fft


def spectrogram_output_size(
    fft_size: int, sample_rate: int, max_fft: int = 16384, preferred_max_step: int = 1000
) -> int:
    """min(SPECTROGRAM_MAX_FFT, getFft(rate, SPECTROGRAM_PREFERRED_MAX_STEP))
    (spectrogram.cpp:14-15)."""
    return min(max_fft, get_fft(sample_rate, preferred_max_step))


def accumulate_frames(psd_frames: jnp.ndarray, output_size: int) -> jnp.ndarray:
    """[n, fft] PSD dB -> [output_size] sum over frames of bin-group means.

    Per frame: out[i] = mean(psd[i*decim : (i+1)*decim]) (spectrogram.cpp:50-57);
    summed over the n frames of the block. The host adds this to the per-range
    container sum and tracks the frame count (container.m_counter += n).
    """
    n, fft_size = psd_frames.shape
    decim = fft_size // output_size
    grouped = psd_frames.reshape(n, output_size, decim)
    return jnp.sum(jnp.mean(grouped, axis=-1), axis=0)
