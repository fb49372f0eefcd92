"""The chunked-matmul decimation stage (ops/ddc.py _stage_apply fast path)
must match the polyphase-as-channels conv form exactly (same y[p] =
dot(x[p*M : p*M + R*M], h_rev); only f32 summation order differs).

This form exists because (a) a 1-output-channel conv runs ~300x under MXU
peak on v5e and (b) the Pallas FIR DMA layout is lane-alignment-fragile
(Mosaic rejects minor dims not multiple of 128 -- found on hardware).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.ops.ddc import _stage_apply, plan_stage

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("decim", [2, 8, 16, 32, 40, 64])
def test_matmul_stage_matches_conv(decim):
    plan = plan_stage(1, decim)
    assert plan.chunk_c > 0 and plan.chunk_c % 128 == 0
    assert plan.chunk_c % decim == 0

    n = decim * 300  # not a multiple of chunk outputs -> exercises padding/slice
    x = jnp.asarray(RNG.standard_normal((3, 2, n)).astype(np.float32))
    tail = jnp.asarray(RNG.standard_normal((3, 2, plan.tail_len)).astype(np.float32))

    out, new_tail = _stage_apply(x, tail, plan)
    ref, ref_tail = _stage_apply(x, tail, plan._replace(chunk_c=0))  # conv form

    assert out.shape == ref.shape == (3, 2, n // decim)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 1e-5
    assert jnp.array_equal(new_tail, ref_tail)


def test_huge_lcm_falls_back_to_conv():
    plan = plan_stage(1, 125)  # lcm(125, 128) = 16000 > chunk cap
    assert plan.chunk_c == 0
    x = jnp.asarray(RNG.standard_normal((1, 2, 125 * 64)).astype(np.float32))
    out, _ = _stage_apply(x, jnp.zeros((1, 2, plan.tail_len), jnp.float32), plan)
    assert out.shape == (1, 2, 64)
