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
from rtl_sdr_scanner_tpu.ops.ddc import NcoTables
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


def make_time_sharded_scan(
    cfg: ScanConfig, mesh: Mesh, group_size: int, top_k: int
):
    """ONE band's detection frames sharded over the "time" mesh axis, with
    the detector carries stitched across shard seams (SURVEY.md section 7
    "detector-state stitching" hard part). For ingest rates beyond a single
    chip's FFT/PSD throughput.

    Stitching per carry (all exact, collective-backed):
    - noise max-hold: learning frames form a time-prefix, and max is
      associative, so the frozen threshold = pmax over shards of each
      shard's local learning max (noise_learner.cpp:11-28 semantics kept);
      readiness is pure time arithmetic (prev-frame times enter as input).
    - averager ring: each shard receives its left neighbor's last
      grouping_y raw rows via ppermute (shard 0 uses the carried ring), so
      every boxcar window and the history vote's prev-tail are exact at
      seams; the outgoing ring is the last shard's tail, replicated with a
      masked psum.
    - detection compaction runs per shard on its local frames.

    Requires frames_per_shard >= grouping_y. Returns a jit:
    (state, iq[F, group] or [F, group, 2], now[F] i32)
      -> (state, body [F, 3K+1+2S] f32 packed rows, spectro [S] f32,
          noise_ready scalar)
    matching the serial _compact_scan_block outputs within float tolerance
    (window sums use per-shard cumsum prefixes; ~1 ulp like the block form).
    """
    from rtl_sdr_scanner_tpu.constants import NO_DATA
    from rtl_sdr_scanner_tpu.models.scan_pipeline import _frames_power
    from rtl_sdr_scanner_tpu.ops.averager import (
        AveragerState,
        averager_block,
        ordered_history,
    )
    from rtl_sdr_scanner_tpu.ops.detect import compact_detection
    from rtl_sdr_scanner_tpu.ops.noise import NoiseState
    from rtl_sdr_scanner_tpu.ops.smooth import sliding_average
    from rtl_sdr_scanner_tpu.ops.spectrogram import accumulate_frames

    n_time = mesh.shape[TIME_AXIS]
    depth = cfg.grouping_y
    half_depth = depth - depth // 2
    f_global = cfg.frames_per_block
    assert f_global % n_time == 0, (f_global, n_time)
    f_loc = f_global // n_time
    assert f_loc >= depth, (
        f"frames per shard {f_loc} must cover the averager depth {depth}"
    )
    learn_ms = cfg.noise_learning_ms

    def shard_fn(state, iq_local, now_local, prev_now, keys, valid, level):
        # iq_local [f_loc, group(,2)]; now_local [f_loc]; prev_now [1]:
        # arrival time of the frame just before this shard's first
        t_idx = jax.lax.axis_index(TIME_AXIS)
        noise_in, avg_in = state.noise, state.averager
        power = _frames_power(cfg, iq_local)

        # -- noise stitching (prefix max over shards) ----------------------
        cond = noise_in.start_ms + learn_ms <= now_local  # [f_loc]
        prev_cond = noise_in.start_ms + learn_ms <= prev_now[0]
        was_ready = noise_in.ready | jnp.concatenate(
            [prev_cond[None], cond[:-1]]
        )
        learning = ~was_ready
        held_local = jnp.max(
            jnp.where(learning[:, None], power, -jnp.inf), axis=0, initial=-jnp.inf
        )
        held = jax.lax.pmax(held_local, TIME_AXIS)
        threshold = jnp.maximum(noise_in.threshold, held)
        raw = jnp.where(
            was_ready[:, None], power - threshold[None, :], jnp.float32(NO_DATA)
        )
        ready_out = noise_in.ready | (
            jax.lax.pmax(cond[-1].astype(jnp.int32), TIME_AXIS) > 0
        )
        noise_out = NoiseState(
            threshold=threshold, ready=ready_out, start_ms=noise_in.start_ms
        )

        # -- averager halo (left neighbor's last `depth` raw rows) ---------
        tail = raw[-depth:]
        left = jax.lax.ppermute(
            tail, TIME_AXIS, [(i, i + 1) for i in range(n_time - 1)]
        )
        prev_rows = jnp.where(t_idx == 0, ordered_history(avg_in), left)
        synth = AveragerState(
            ring=prev_rows,
            total=jnp.zeros_like(avg_in.total),
            pos=jnp.asarray(0, dtype=jnp.int32),
            frames=jnp.minimum(avg_in.frames + t_idx * f_loc, depth).astype(jnp.int32),
        )
        avg_local_state, means = averager_block(synth, raw)
        avg_rows = sliding_average(means, cfg.grouping_x)

        # outgoing ring/total live on the last shard; replicate via psum
        is_last = (t_idx == n_time - 1).astype(jnp.float32)
        avg_out = AveragerState(
            ring=jax.lax.psum(avg_local_state.ring * is_last, TIME_AXIS),
            total=jax.lax.psum(avg_local_state.total * is_last, TIME_AXIS),
            pos=jnp.asarray(0, dtype=jnp.int32),
            frames=jnp.minimum(avg_in.frames + f_global, depth).astype(jnp.int32),
        )

        # -- detection on local frames (prev-tail from the halo) -----------
        compact = compact_detection(
            avg_rows,
            raw,
            prev_rows[-(half_depth - 1) :],
            keys,
            valid,
            level,
            group_size,
            top_k,
        )
        f32 = lambda a: a.astype(jnp.float32)
        body = jnp.concatenate(
            [
                f32(compact.cand_idx),
                compact.cand_val,
                f32(compact.cand_best),
                f32(compact.cand_count)[:, None],
                compact.key_val,
                f32(compact.key_idx),
            ],
            axis=1,
        )  # [f_loc, 3K+1+2S]

        spectro = jax.lax.psum(
            accumulate_frames(power, cfg.spectro_size), TIME_AXIS
        )
        state_out = ScanState(noise=noise_out, averager=avg_out)
        return state_out, body, spectro, ready_out

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), init_scan_state(cfg)),  # replicated state
            P(TIME_AXIS),  # iq frames split on time
            P(TIME_AXIS),  # now
            P(TIME_AXIS),  # prev_now [n_time]
            P(None),  # keys [S]
            P(None),  # valid [fft]
            P(),  # start_level scalar
        ),
        out_specs=(
            jax.tree.map(lambda _: P(), init_scan_state(cfg)),
            P(TIME_AXIS),
            P(None),
            P(),
        ),
        check_vma=False,
    )

    def step(state: ScanState, iq: jnp.ndarray, now: jnp.ndarray, keys, valid, level):
        prev_now = jnp.concatenate(
            [jnp.asarray([-(2**30)], dtype=jnp.int32), now[f_loc - 1 :: f_loc][:-1]]
        )
        return fn(state, iq, now, prev_now, keys, valid, level)

    return jax.jit(step)


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
