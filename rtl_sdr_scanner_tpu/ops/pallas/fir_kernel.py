"""Pallas decimating-FIR kernel for the DDC resampler stages.

The XLA lowering of the polyphase decimator (ops/ddc.py _stage_apply) is a
1-output-channel convolution -- a pathological MXU shape that measured
~61 ms per 2M-sample chunk at 32 bands on v5e (the whole DDC's dominant
cost; reference chain recorder.cpp:29-33). This kernel computes the exact
same y[p] = sum_{q,r} rows[p+q, r] * W[r, q] (W = reversed-tap polyphase
matrix, plan_stage ops/ddc.py) as:

  per tile:  Z = rows_tile @ W        (one [TB*(To+R-1), M] x [M, R] MXU dot)
             y[p] = sum_q Z[p+q, q]   (R static diagonal slices in VMEM)

with the input window DMA'd HBM->VMEM per tile (windows of consecutive
tiles overlap by R-1 rows, which BlockSpecs cannot express -- hence the
manual copy). Input is read once (~1.04x), output written once; nothing is
rematerialized in HBM. Validated bit-close (f32 sum-order) against the conv
form; the int8 recording tolerance (<=1 LSB, tests/test_ops_ddc.py) holds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 8  # batch rows per tile (f32 sublane tile)


def _pick_to(out_len: int, target: int = 512) -> int:
    """Largest output-tile width <= target dividing out_len (0 if none >= 64)."""
    best = 0
    for cand in range(min(target, out_len), 63, -1):
        if out_len % cand == 0:
            best = cand
            break
    return best


@functools.partial(
    jax.jit, static_argnames=("m", "r_rows", "out_len", "to", "interpret")
)
def _decim_fir_rows(
    rows3d: jnp.ndarray,  # [B, out_len + r_rows - 1, m] f32 (free XLA reshape)
    w: jnp.ndarray,  # [m, r_rows] f32 polyphase matrix
    m: int,
    r_rows: int,
    out_len: int,
    to: int,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, out_len] f32
    b, n_rows, _ = rows3d.shape
    assert n_rows == out_len + r_rows - 1, (n_rows, out_len, r_rows)
    assert b % TB == 0 and out_len % to == 0
    win_rows = to + r_rows - 1

    def kernel(x_hbm, w_ref, o_ref, in_tile, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi * TB, TB), pl.ds(ti * to, win_rows), :],
            in_tile,
            sem,
        )
        dma.start()
        dma.wait()
        z = jax.lax.dot_general(
            in_tile[:],
            w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TB, win_rows, r_rows]
        acc = z[:, 0:to, 0]
        for q in range(1, r_rows):
            acc = acc + z[:, q : q + to, q]
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(b // TB, out_len // to),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((m, r_rows), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, to), lambda bi, ti: (bi, ti), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_len), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, win_rows, m), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rows3d, w)


def stage_apply_pallas(x: jnp.ndarray, tail: jnp.ndarray, plan, interpret: bool = False):
    """Drop-in for ops.ddc._stage_apply on decimation-only stages.

    x: [K, 2, n] f32; tail: [K, 2, tail_len] -> ([K, 2, n//M], new_tail).
    Falls back to ops.ddc._stage_apply (chunked-matmul form) when the
    geometry does not tile. NOTE (measured on v5e hardware): Mosaic requires
    HBM DMA slices to be lane-aligned on the minor dim, so this kernel is
    only legal when M % 128 == 0 -- interpret mode does not enforce this.
    The chunked-matmul form in ops/ddc.py is the production TPU path.
    """
    from rtl_sdr_scanner_tpu.ops.ddc import _stage_apply

    k, two, n = x.shape
    m, r_rows = plan.decim, plan.poly_rows
    out_len = n * plan.interp // plan.decim
    to = _pick_to(out_len)
    if plan.interp != 1 or to == 0 or (k * two) % TB != 0 or (m % 128 != 0 and not interpret):
        return _stage_apply(x, tail, plan)

    need = (out_len + r_rows - 1) * m
    pad = need - n - plan.tail_len
    full = jnp.concatenate(
        [tail, x, jnp.zeros((k, two, pad), x.dtype)], axis=-1
    )  # XLA fuses producers into the concatenate: one write
    new_tail = full[..., n : n + plan.tail_len]
    out = _decim_fir_rows(
        full.reshape(k * two, need // m, m),
        jnp.asarray(plan.poly_kernel[0]),  # [M, R]
        m,
        r_rows,
        out_len,
        to,
        interpret,
    )
    return out.reshape(k, two, out_len), new_tail


__all__ = ["stage_apply_pallas"]
