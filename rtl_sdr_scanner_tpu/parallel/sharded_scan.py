"""Multi-band, multi-chip scan + DDC.

The north-star upgrade over the reference: instead of one SDR thread
time-multiplexing hop ranges at 500 ms dwell (scanner.cpp:46-60), a mesh
scans B bands CONCURRENTLY -- band b on mesh coordinate b % n_bands -- with
per-band carry state sharded alongside.

Two device programs:

- make_sharded_scan_step(cfg, mesh): vmapped scan block over a leading bands
  axis, sharded over the mesh "bands" axis. Embarrassingly parallel: XLA
  inserts no collectives; scaling is linear by construction.
- make_time_sharded_ddc(cfg, mesh): one band's long IQ block sharded over the
  "time" axis with overlap-save halo exchange (parallel/halo.py) through the
  resampler chain -- for rates beyond a single chip's ingest.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig
from rtl_sdr_scanner_tpu.models.scan_pipeline import (
    ScanConfig,
    ScanState,
    _scan_block,
    init_scan_state,
)
from rtl_sdr_scanner_tpu.ops.ddc import NcoTables, chain_output_length
from rtl_sdr_scanner_tpu.parallel.halo import resample_chain_sharded
from rtl_sdr_scanner_tpu.parallel.mesh import BANDS_AXIS, TIME_AXIS, band_sharding


def init_banded_state(cfg: ScanConfig, n_bands: int, mesh: Mesh, start_ms=0) -> ScanState:
    """Band-stacked scan state, placed with the bands sharding."""
    one = init_scan_state(cfg, start_ms)
    stacked = jax.tree.map(lambda a: jnp.broadcast_to(a, (n_bands,) + a.shape), one)
    return jax.device_put(stacked, band_sharding(mesh))


def make_sharded_scan_step(cfg: ScanConfig, mesh: Mesh):
    """(state[B,...], iq[B, frames, group], now[B, frames]) -> (state, outs).

    All leading axes shard over "bands"; per-band pipelines are independent,
    so the partitioned program runs without collectives.
    """
    shard = NamedSharding(mesh, P(BANDS_AXIS))

    vmapped = jax.vmap(functools.partial(_scan_block, cfg))
    return jax.jit(
        vmapped,
        in_shardings=(
            jax.tree.map(lambda _: shard, init_scan_state(cfg)),
            shard,
            shard,
        ),
        out_shardings=(
            jax.tree.map(lambda _: shard, init_scan_state(cfg)),
            shard,
        ),
        donate_argnums=(0,),
    )


def make_sharded_compact_step(
    cfg: ScanConfig, group_size: int, top_k: int, mesh: Mesh
):
    """Compact-detection banded step sharded over the mesh "bands" axis.

    This is the runtime's multi-chip program (runtime/wideband.py mesh mode):
    per-band tracked keys and valid masks ride the band axis (unlike the
    benchmark's make_banded_fused_step, which shares them), so each sub-band
    session keeps its own detector context. Embarrassingly parallel -- no
    collectives -- which is the point: the reference scans bands sequentially
    (scanner.cpp:46-60); a mesh scans them all at once.

    (state[B,..], acc[B,S], iq[B,F,G,2], now[B,F], keys[B,S], valid[B,fft],
     start_level, keep) -> (state, acc, CompactScanOutputs[B,..])
    """
    from rtl_sdr_scanner_tpu.models.scan_pipeline import _compact_scan_block

    shard = NamedSharding(mesh, P(BANDS_AXIS))
    repl = NamedSharding(mesh, P())

    vmapped = jax.vmap(
        functools.partial(_compact_scan_block, cfg, group_size, top_k),
        in_axes=(0, 0, 0, 0, 0, 0, None, None),
    )
    state_shard = jax.tree.map(lambda _: shard, init_scan_state(cfg))
    return jax.jit(
        vmapped,
        in_shardings=(state_shard, shard, shard, shard, shard, shard, repl, repl),
        # pin outputs too: without this XLA may replicate small per-band
        # leaves (averager.pos etc.), which then mismatch the next call's
        # in_shardings
        out_shardings=(state_shard, shard, shard),
        donate_argnums=(0, 1),
    )


def make_time_sharded_ddc(cfg: DdcConfig, mesh: Mesh):
    """One band's block time-sharded across the "time" axis, K slots batched.

    (iq[n_global] c64, tables) -> int8 [K, out_global, 2]. Rotation uses
    per-shard NCO tables (the host builds tables for the GLOBAL chunk length
    so each shard indexes its own angle slice exactly); stage tails come from
    the left neighbor via ppermute.
    """
    n_time = mesh.shape[TIME_AXIS]

    def shard_fn(iq_local, c_re_l, c_im_l, f_re, f_im, phase0) -> jnp.ndarray:
        # iq_local: [1, n_local]; c_*_l: [K, nq_local] -- shard_map hands each
        # time shard its own slice of the global (cos, sin) rotation tables
        k = phase0.shape[0]
        ph_re, ph_im = jnp.cos(phase0)[:, None], jnp.sin(phase0)[:, None]
        cr = ph_re * c_re_l - ph_im * c_im_l
        ci = ph_re * c_im_l + ph_im * c_re_l
        rot_re = (cr[:, :, None] * f_re[:, None, :] - ci[:, :, None] * f_im[:, None, :]).reshape(k, -1)
        rot_im = (cr[:, :, None] * f_im[:, None, :] + ci[:, :, None] * f_re[:, None, :]).reshape(k, -1)
        y = jnp.stack(
            [
                jnp.real(iq_local) * rot_re - jnp.imag(iq_local) * rot_im,
                jnp.real(iq_local) * rot_im + jnp.imag(iq_local) * rot_re,
            ],
            axis=1,
        )  # [K, 2, n_local]
        y = resample_chain_sharded(y, cfg.plans, TIME_AXIS)
        out = jnp.clip(jnp.round(jnp.moveaxis(y, 1, 2) * 127.0), -128, 127).astype(jnp.int8)
        return out

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(None, TIME_AXIS),  # iq [1, n_global] split on time
            P(None, TIME_AXIS),  # coarse cos [K, n_q_global] split on time
            P(None, TIME_AXIS),  # coarse sin [K, n_q_global] split on time
            P(None, None),  # fine cos [K, Q] replicated
            P(None, None),  # fine sin [K, Q] replicated
            P(None),  # phase0 [K] replicated
        ),
        out_specs=P(None, TIME_AXIS, None),  # [K, out_global, 2] split on time
        check_vma=False,
    )

    def step(iq_global: jnp.ndarray, tables: NcoTables) -> jnp.ndarray:
        out = fn(
            iq_global[None, :],
            tables.coarse_re,
            tables.coarse_im,
            tables.fine_re,
            tables.fine_im,
            jnp.zeros_like(tables.step),
        )
        return out

    return jax.jit(step)
