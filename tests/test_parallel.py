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
