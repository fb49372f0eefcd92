"""Pallas decimating-FIR kernel parity (interpret mode on CPU) and the
banded all-bands DDC path vs the per-band vmapped reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.models.ddc_pipeline import (
    DdcConfig,
    _ddc_block,
    _ddc_block_banded,
    fold_banded,
    init_state,
    make_tables,
)
from rtl_sdr_scanner_tpu.ops.ddc import _stage_apply, plan_stage
from rtl_sdr_scanner_tpu.ops.pallas.fir_kernel import _pick_to, stage_apply_pallas


def test_stage_apply_pallas_matches_conv():
    rng = np.random.default_rng(0)
    for interp, decim, n in [(1, 32, 32 * 2048), (1, 40, 40 * 1024), (1, 8, 8 * 4096)]:
        plan = plan_stage(interp, decim)
        x = rng.standard_normal((2, 2, n)).astype(np.float32)
        tail = rng.standard_normal((2, 2, plan.tail_len)).astype(np.float32)
        y_ref, t_ref = _stage_apply(jnp.asarray(x), jnp.asarray(tail), plan)
        y_pal, t_pal = stage_apply_pallas(
            jnp.asarray(x), jnp.asarray(tail), plan, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_pal))
        ref = np.asarray(y_ref)
        err = np.abs(ref - np.asarray(y_pal)).max()
        scale = np.abs(ref).max()
        assert err <= 2e-5 * scale, (decim, err, scale)  # f32 sum-order only


def test_stage_apply_pallas_falls_back_on_interpolating_stage():
    plan = plan_stage(5, 4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 4 * 512)).astype(np.float32)
    tail = np.zeros((1, 2, plan.tail_len), np.float32)
    y_ref, _ = _stage_apply(jnp.asarray(x), jnp.asarray(tail), plan)
    y_pal, _ = stage_apply_pallas(jnp.asarray(x), jnp.asarray(tail), plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_pal))


def test_pick_to():
    assert _pick_to(61440) == 512
    assert _pick_to(1536) == 512
    assert _pick_to(97) == 97  # whole row in one tile
    assert _pick_to(61) == 0  # too small -> fallback


def test_banded_ddc_matches_vmapped():
    rate, bw = 256000, 16000
    n_bands, slots = 3, 2
    cfg = DdcConfig.create(rate, bw, slots, 1280 * 24)
    rng = np.random.default_rng(2)
    iq = rng.integers(-64, 64, size=(n_bands, cfg.block_samples, 2), dtype=np.int8)
    shifts = np.array([30000, -20000])
    stack = lambda a: jnp.broadcast_to(a, (n_bands,) + a.shape)
    tables = jax.tree.map(stack, make_tables(cfg, shifts))
    state = jax.tree.map(stack, init_state(cfg))

    vm = jax.jit(jax.vmap(functools.partial(_ddc_block, cfg), in_axes=(0, 0, 0)))
    banded = jax.jit(functools.partial(_ddc_block_banded, cfg, n_bands, False))

    s_a, out_a = vm(state, jnp.asarray(iq), tables)
    s_b, out_b = banded(fold_banded(state), jnp.asarray(iq), fold_banded(tables))

    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # state layout differs between v1 (folded [NB*K]) and v2 (stacked [NB]);
    # compare leaves shape-agnostically
    for leaf_a, leaf_b in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(
            np.asarray(leaf_a).reshape(np.asarray(leaf_b).shape), np.asarray(leaf_b)
        )
