"""Fused Pallas PSD kernel: int8 IQ -> windowed four-step FFT -> PSD dB.

Replaces the chain dequantize_cs8 -> frame-select -> hamming window ->
jnp.fft.fft -> fftshift -> |X|^2 -> 10log10 (ops/psd.py; reference hot chain
sdr_device.cpp:161-165) with ONE kernel per frame that:

- reads the frame's int8 IQ once from HBM (decimator frame-select happens in
  the BlockSpec index map: only the first fft_size samples of each
  fft*decim group are ever fetched);
- dequantizes and windows on the VPU; the fftshift is folded into the window
  as (-1)^n (shift theorem), so no output reshuffle pass is needed;
- computes the DFT as the four-step algorithm N = N1*N2: column DFT (MXU
  matmul vs F_N1), twiddle multiply, row DFT (MXU matmul vs F_N2) -- this is
  the classic way to put an FFT on a systolic array;
- finishes with |X|^2 / rate in dB and writes the single f32 output row.

HBM traffic per frame: fft*2 bytes in + fft*4 bytes out (plus the DFT tables,
resident in VMEM across grid steps). All FLOPs land on the MXU.

Measured (TPU v5e, fft=131072, 20 frames/block, 2026-08-17):
  this kernel 13.2 ms/block vs XLA chain (jnp.fft + fused elementwise)
  2.75 ms/block -- XLA's native FFT does ~30x fewer FLOPs than the four-step
  matmul form and wins despite the extra HBM round trips, so the XLA chain
  stays the default (use_pallas_psd=False). Numerics: mean |diff| 0.026 dB;
  outliers up to ~28 dB only at deep FFT nulls where f32 cancellation noise
  meets log10 (harmless for max-hold/threshold detection).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtl_sdr_scanner_tpu.ops.window import hamming


def _split_n(n: int) -> Tuple[int, int]:
    """N = N1*N2 with N1 >= N2, both powers of two (N power of two)."""
    log = n.bit_length() - 1
    l1 = (log + 1) // 2
    return 1 << l1, 1 << (log - l1)


@functools.lru_cache(maxsize=8)
def _tables(fft_size: int, shift: bool = True):
    """Host-side DFT/twiddle/window tables (f32 pairs)."""
    n1, n2 = _split_n(fft_size)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)  # [n1, n1]
    f2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2)  # [n2, n2]
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / fft_size)  # [k1, n2]
    win = hamming(fft_size).astype(np.float64)
    if shift:
        win = win * np.where(np.arange(fft_size) % 2 == 0, 1.0, -1.0)
    win = win.reshape(n1, n2)  # x[n] = A[n1, n2], n = n1*n2_len + n2
    c64 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return n1, n2, c64(f1), c64(f2), c64(tw), win.astype(np.float32)


# k1-tile size: the kernel processes TILE rows of the first-stage DFT per
# grid step, keeping VMEM (incl. pipeline double-buffering) well under budget.
TILE_K1 = 128


def _psd_kernel(
    x_ref,  # [1, n1, n2, 2] int8 (frame IQ, interleaved)
    f1r_ref, f1i_ref,  # [TILE, n1] rows of F_N1 for this k1 tile
    f2r_ref, f2i_ref,  # [n2, n2]
    twr_ref, twi_ref,  # [TILE, n2] twiddle rows for this k1 tile
    win_ref,  # [n1, n2]
    out_ref,  # [1, n2, TILE]: out[k2, k1] = X[k2*n1 + k1]
    *,
    inv_rate: float,
):
    x = x_ref[0].astype(jnp.float32) * (1.0 / 127.5)
    w = win_ref[:]
    ar = x[:, :, 0] * w
    ai = x[:, :, 1] * w

    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    # column DFT over n1, this k1 tile: B[k1, n2] = sum_n1 F1[k1, n1] A[n1, n2]
    br = dot(f1r, ar) - dot(f1i, ai)
    bi = dot(f1r, ai) + dot(f1i, ar)
    # twiddle
    twr, twi = twr_ref[:], twi_ref[:]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # row DFT over n2: D[k1, k2] = sum_n2 C[k1, n2] F2[k2, n2]
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    dr = dot(cr, f2r.T) - dot(ci, f2i.T)
    di = dot(cr, f2i.T) + dot(ci, f2r.T)

    power = dr * dr + di * di
    psd = 10.0 * jnp.log10(jnp.maximum(power, 1e-30) * inv_rate)
    # X[k2*n1 + k1] = D[k1, k2] -> output tile is D transposed
    out_ref[0] = psd.T


def psd_frames_int8_pallas(
    iq_int8: jnp.ndarray,
    sample_rate: float,
    fft_size: int,
    decim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[frames, fft*decim, 2] int8 -> [frames, fft] f32 PSD dB (fftshifted).

    Equivalent to dequantize_cs8 + frame_blocks + psd_frames (ops/psd.py).
    """
    frames = iq_int8.shape[0]
    n1, n2, (f1r, f1i), (f2r, f2i), (twr, twi), win = _tables(fft_size)
    x = iq_int8.reshape(frames, decim * n1, n2, 2)
    tile = min(TILE_K1, n1)

    kernel = functools.partial(_psd_kernel, inv_rate=1.0 / float(sample_rate))
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    k1_rows = lambda: pl.BlockSpec((tile, n1), lambda k, j: (j, 0), memory_space=pltpu.VMEM)
    tw_rows = lambda: pl.BlockSpec((tile, n2), lambda k, j: (j, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(frames, n1 // tile),
        in_specs=[
            # frame-select: only rows [0, n1) of each frame's decim*n1 rows
            pl.BlockSpec(
                (1, n1, n2, 2), lambda k, j: (k, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            k1_rows(), k1_rows(),  # F1 rows for this k1 tile
            full(), full(),  # F2
            tw_rows(), tw_rows(),  # twiddle rows
            full(),  # window
        ],
        out_specs=pl.BlockSpec(
            (1, n2, tile), lambda k, j: (k, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((frames, n2, n1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=frames * 8 * (n1 * n1 * n2 + n1 * n2 * n2),
            bytes_accessed=frames * (fft_size * 2 + fft_size * 4),
            transcendentals=frames * fft_size,
        ),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, f1r, f1i, f2r, f2i, twr, twi, win)
    return out.reshape(frames, fft_size)
