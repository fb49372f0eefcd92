"""Sharding tests on the virtual 8-device CPU mesh.

- banded scan: 8 bands concurrently, results identical to per-band serial runs
- time-sharded DDC: halo-exchange output equals the single-chip streaming chain
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig
from rtl_sdr_scanner_tpu.models.scan_pipeline import (
    ScanConfig,
    init_scan_state,
    make_scan_step,
)
from rtl_sdr_scanner_tpu.ops.ddc import ddc_chunk, init_ddc_state, make_nco_tables
from rtl_sdr_scanner_tpu.parallel.mesh import make_mesh
from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
    init_banded_state,
    make_sharded_scan_step,
    make_time_sharded_ddc,
)

RATE = 256000


def test_banded_scan_matches_serial():
    n_bands = 8
    mesh = make_mesh(n_bands=n_bands, n_time=1)
    cfg = ScanConfig.create(RATE, frames_per_block=4)
    rng = np.random.default_rng(0)
    group = cfg.fft_size * cfg.decimator_factor
    iq = (
        rng.standard_normal((n_bands, cfg.frames_per_block, group))
        + 1j * rng.standard_normal((n_bands, cfg.frames_per_block, group))
    ).astype(np.complex64) * 0.05
    now = np.tile(
        (np.arange(1, cfg.frames_per_block + 1) * cfg.frame_interval_ms).astype(np.int32),
        (n_bands, 1),
    )

    banded_step = make_sharded_scan_step(cfg, mesh)
    state = init_banded_state(cfg, n_bands, mesh)
    state, outs = banded_step(state, jnp.asarray(iq), jnp.asarray(now))

    serial_step = make_scan_step(cfg)
    for b in range(n_bands):
        s = init_scan_state(cfg)
        s, o = serial_step(s, jnp.asarray(iq[b]), jnp.asarray(now[b]))
        np.testing.assert_allclose(np.asarray(outs.raw)[b], np.asarray(o.raw), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(outs.spectro_sum)[b], np.asarray(o.spectro_sum), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(state.noise.threshold)[b], np.asarray(s.noise.threshold), atol=1e-4
        )


def test_time_sharded_ddc_matches_streaming():
    n_time = 4
    mesh = make_mesh(n_bands=1, n_time=n_time)
    cfg = DdcConfig.create(
        sample_rate=1024000, bandwidth=16000, num_slots=2, block_samples=4096 * 4 * n_time
    )
    n_global = cfg.block_samples
    rng = np.random.default_rng(4)
    iq = (rng.standard_normal(n_global) + 1j * rng.standard_normal(n_global)).astype(
        np.complex64
    ) * 0.3

    shifts = np.array([100000, -50000])
    # global tables: one "chunk" spanning the whole sharded block
    tables_global = make_nco_tables(shifts, cfg.sample_rate, n_global)
    sharded = make_time_sharded_ddc(cfg, mesh)
    got = np.asarray(sharded(jnp.asarray(iq), tables_global))  # [K, out, 2]

    # single-chip streaming reference over the same stream
    state = init_ddc_state(cfg.plans, 2)
    chunk = n_global // n_time
    tables = make_nco_tables(shifts, cfg.sample_rate, chunk)
    outs = []
    for b in range(n_time):
        state, out = ddc_chunk(
            jnp.asarray(iq[b * chunk : (b + 1) * chunk]), state, tables, cfg.plans
        )
        outs.append(np.asarray(out))
    ref = np.concatenate(outs, axis=1)

    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_time_sharded_scan_matches_serial():
    """One band's detection frames sharded over 4 time shards, with
    noise/averager carries stitched across seams (SURVEY.md section 7 hard
    part) -- packed detector rows, spectrogram, and carried state match the
    serial compact block over two consecutive blocks (covering the noise
    learning -> ready transition and the averager warmup)."""
    import functools

    from rtl_sdr_scanner_tpu.models.scan_pipeline import _compact_scan_block
    from rtl_sdr_scanner_tpu.parallel.sharded_scan import make_time_sharded_scan

    n_time = 4
    mesh = make_mesh(n_bands=1, n_time=n_time)
    cfg = ScanConfig.create(RATE, frames_per_block=84)  # 21 frames per shard
    group = cfg.fft_size * cfg.decimator_factor
    group_size, top_k, s_keys = 63, 16, 4

    rng = np.random.default_rng(3)
    n = cfg.block_samples * 2
    t = np.arange(n) / RATE
    iq = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = np.sin(2 * np.pi * 700 * t)
    phase = 2 * np.pi * 30000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / RATE
    iq += 0.4 * np.exp(1j * phase) * (t >= 2.2)  # keys on after learning
    iq = iq.astype(np.complex64)

    keys = jnp.asarray(np.full(s_keys, -1, dtype=np.int32))
    valid = jnp.asarray(np.ones(cfg.fft_size, dtype=bool))
    level = jnp.float32(8.0)
    frame_ms = cfg.frame_interval_ms

    sharded = make_time_sharded_scan(cfg, mesh, group_size, top_k)
    serial = jax.jit(functools.partial(_compact_scan_block, cfg, group_size, top_k))

    st_sh = init_scan_state(cfg, 0)
    st_se = init_scan_state(cfg, 0)
    acc = jnp.zeros((cfg.spectro_size,), dtype=jnp.float32)
    row = 3 * (top_k + 16) + 1 + 2 * s_keys

    for b in range(2):
        blk = iq[b * cfg.block_samples : (b + 1) * cfg.block_samples].reshape(
            cfg.frames_per_block, group
        )
        now = (
            (b * cfg.frames_per_block + 1 + np.arange(cfg.frames_per_block)) * frame_ms
        ).astype(np.int32)
        st_sh, body, spectro, ready = sharded(
            st_sh, jnp.asarray(blk), jnp.asarray(now), keys, valid, level
        )
        st_se, acc_out, outs = serial(
            st_se, acc, jnp.asarray(blk), jnp.asarray(now), keys, valid, level,
            jnp.float32(0.0),  # fresh accumulator each block
        )
        packed = np.asarray(outs.packed)
        ref_body = packed[: cfg.frames_per_block * row].reshape(cfg.frames_per_block, row)
        got = np.asarray(body)

        k2 = top_k + 16
        # values (powers) within block-form tolerance. Indices match except
        # where per-shard cumsum prefixes flip a ~1 ulp near-tie in the
        # boxcar sums (measured ~0.1%): those picks must be rank-equivalent
        # (same candidate value at the same rank).
        gi, ri = got[:, :k2], ref_body[:, :k2]
        gv, rv = got[:, k2 : 2 * k2], ref_body[:, k2 : 2 * k2]
        mism = gi != ri
        assert mism.mean() < 0.005, mism.mean()
        np.testing.assert_allclose(gv, rv, atol=2e-3)  # cand_val by rank
        gb, rb = got[:, 2 * k2 : 3 * k2], ref_body[:, 2 * k2 : 3 * k2]
        assert ((gb != rb) & ~mism).mean() < 0.005  # votes differ only at ties
        np.testing.assert_array_equal(got[:, 3 * k2], ref_body[:, 3 * k2])  # count
        np.testing.assert_allclose(got[:, 3 * k2 + 1 :], ref_body[:, 3 * k2 + 1 :], atol=2e-3)
        np.testing.assert_allclose(np.asarray(spectro), np.asarray(acc_out), atol=5e-3)
        assert bool(ready) == bool(outs.noise_ready)
        # power rows come from differently-batched FFTs (84-frame serial vs
        # 21-frame shards): tolerances cover that float noise
        np.testing.assert_allclose(
            np.asarray(st_sh.noise.threshold), np.asarray(st_se.noise.threshold), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(st_sh.averager.ring), np.asarray(st_se.averager.ring), atol=2e-3
        )
        assert int(st_sh.averager.frames) == int(st_se.averager.frames)


def test_time_sharded_modtap_fits_boundaries():
    """Static geometry gate for the time-sharded streaming DDC."""
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig
    from rtl_sdr_scanner_tpu.parallel.sharded_scan import time_sharded_modtap_fits

    cfg = DdcConfig.create(256000, 16000, 2, 491520)
    assert cfg.modtap
    assert time_sharded_modtap_fits(cfg, 4)  # the tested runtime geometry
    assert time_sharded_modtap_fits(cfg, 2)
    assert not time_sharded_modtap_fits(cfg, 7)  # chunk % (n*decim) != 0
    # shards smaller than the stage tail cannot halo exactly
    assert not time_sharded_modtap_fits(cfg, 4096)


def test_wideband_fused_step_matches_split():
    """make_sharded_wideband_fused_step (ONE dispatch: channelize + scan +
    banded DDC; round-4 verdict weak #2) produces bit-identical outputs and
    carried state to the split two-dispatch path (make_sharded_wideband_step
    then make_sharded_banded_ddc) -- same shard_fn pieces, same operand
    order, only the dispatch boundary moves."""
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import make_tables
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        init_channelizer_state,
        plan_channelizer,
    )
    from rtl_sdr_scanner_tpu.parallel.mesh import band_sharding, replicated
    from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
        init_banded_ddc_state,
        make_sharded_banded_ddc,
        make_sharded_wideband_fused_step,
        make_sharded_wideband_step,
    )

    n_bands = 8
    mesh = make_mesh(n_bands=n_bands, n_time=1)
    sub_rate = RATE  # 256 kHz per channel
    cfg = ScanConfig.create(sub_rate, frames_per_block=4)
    group = cfg.fft_size * cfg.decimator_factor
    block = cfg.block_samples
    ddc_cfg = DdcConfig.create(sub_rate, 16000, 2, block)
    assert ddc_cfg.modtap
    group_size = 64
    plan = plan_channelizer(n_bands)

    rng = np.random.default_rng(9)
    pairs = jnp.asarray(
        rng.standard_normal((n_bands * block, 2)).astype(np.float32) * 0.05
    )
    now = ((1 + np.arange(cfg.frames_per_block)) * cfg.frame_interval_ms).astype(
        np.int32
    )
    keys = jnp.asarray(np.full((n_bands, 16), -1, dtype=np.int32))
    valid = jnp.asarray(np.ones((n_bands, cfg.fft_size), dtype=bool))
    per_band = [
        make_tables(ddc_cfg, rng.integers(-sub_rate // 2, sub_rate // 2, size=2))
        for _ in range(n_bands)
    ]
    tables = jax.device_put(
        jax.tree.map(lambda *xs: jnp.stack(xs), *per_band), band_sharding(mesh)
    )
    keep_mask = np.ones((n_bands, 2), dtype=np.float32)
    keep_mask[3, 1] = 0.0  # exercise the in-dispatch slot reset too

    def fresh_states():
        from rtl_sdr_scanner_tpu.parallel.sharded_scan import init_banded_state

        return (
            jax.device_put(init_channelizer_state(plan), replicated(mesh)),
            init_banded_state(cfg, n_bands, mesh),
            jax.device_put(
                jnp.zeros((n_bands, cfg.spectro_size), dtype=jnp.float32),
                band_sharding(mesh),
            ),
            init_banded_ddc_state(ddc_cfg, n_bands, mesh),
        )

    # split path
    wide_step = make_sharded_wideband_step(cfg, group_size, 16, mesh, plan, 1, n_bands)
    ddc_step = make_sharded_banded_ddc(ddc_cfg, mesh, n_bands)
    cs, ss, acc, ds = fresh_states()
    cs, ss, acc, packed_a, channels_a = wide_step(
        cs, ss, acc, pairs, jnp.asarray(now), keys, valid,
        jnp.float32(8.0), jnp.float32(1.0),
    )
    ds, rec_a = ddc_step(ds, channels_a, tables, keep_mask)
    split_state = (cs, ss, acc, ds)

    # fused path
    fused = make_sharded_wideband_fused_step(
        cfg, ddc_cfg, group_size, 16, mesh, plan, 1, n_bands
    )
    cs2, ss2, acc2, ds2 = fresh_states()
    cs2, ss2, acc2, ds2, packed_b, rec_b, channels_b = fused(
        cs2, ss2, acc2, ds2, pairs, jnp.asarray(now), keys, valid,
        jnp.float32(8.0), jnp.float32(1.0), tables, keep_mask,
    )

    np.testing.assert_array_equal(np.asarray(packed_a), np.asarray(packed_b))
    np.testing.assert_array_equal(np.asarray(rec_a), np.asarray(rec_b))
    np.testing.assert_array_equal(np.asarray(channels_a), np.asarray(channels_b))
    for a, b in zip(jax.tree.leaves(split_state), jax.tree.leaves((cs2, ss2, acc2, ds2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
