"""Time-domain boxcar averager (device side, functional state).

Replaces the reference Averager (sources/radio/averager.cpp): a ring of
GROUPING_Y frames with a running column sum. Emits the NO_DATA sentinel until
the ring has filled once since the last reset (averager.cpp:52-60).

The ring also serves the detector's history vote (Transmission::getBestIndex,
transmission.cpp:132-154), so ring contents and write position are part of the
state and the pipeline exposes per-frame raw rows to the host.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from rtl_sdr_scanner_tpu.constants import NO_DATA


class AveragerState(NamedTuple):
    ring: jnp.ndarray  # [depth, fft] f32 (bf16 in power_bf16 mode), zeros-init
    total: jnp.ndarray  # [fft] f32 running column sum (always f32)
    pos: jnp.ndarray  # scalar i32 next write slot
    frames: jnp.ndarray  # scalar i32, saturates at depth


def init_averager_state(
    fft_size: int, depth: int, dtype=jnp.float32
) -> AveragerState:
    """dtype controls the RING storage (power_bf16 tolerance mode stores
    rows in bf16; sums/means stay f32)."""
    return AveragerState(
        ring=jnp.zeros((depth, fft_size), dtype=dtype),
        total=jnp.zeros((fft_size,), dtype=jnp.float32),
        pos=jnp.asarray(0, dtype=jnp.int32),
        frames=jnp.asarray(0, dtype=jnp.int32),
    )


def averager_step(
    state: AveragerState, frame: jnp.ndarray
) -> Tuple[AveragerState, jnp.ndarray]:
    """Push one frame; return the boxcar mean (or sentinel while warming).

    O(fft) update exactly like the reference: subtract the recycled slot, add
    the new frame (averager.cpp:14-25).
    """
    depth = state.ring.shape[0]
    stored = frame.astype(state.ring.dtype)  # one quantization in bf16 mode
    old = state.ring[state.pos]
    total = state.total - old.astype(jnp.float32) + stored.astype(jnp.float32)
    ring = state.ring.at[state.pos].set(stored)
    pos = (state.pos + 1) % depth
    frames = jnp.minimum(state.frames + 1, depth)
    ready = frames >= depth
    mean = jnp.where(ready, total / depth, jnp.full_like(total, NO_DATA))
    return AveragerState(ring=ring, total=total, pos=pos, frames=frames), mean


def averager_block(
    state: AveragerState, rows: jnp.ndarray
) -> Tuple[AveragerState, jnp.ndarray]:
    """All frames of a block at once: boxcar means via one cumsum over the
    (history ++ block) rows instead of a per-frame lax.scan.

    rows: [F, fft] -> means [F, fft] (NO_DATA sentinel while warming).

    Numerics: each mean is an exact depth-row sum (cumsum difference) --
    the sequential form carries a running total (total - old + new) whose
    f32 rounding drifts, so results can differ by ~1 ulp; detection operates
    on >=dB-scale margins. The returned ring is stored oldest-first with
    pos=0 (an equivalent state representation; ordered_history is identity).
    """
    depth, fft = state.ring.shape
    f = rows.shape[0]
    all_rows = jnp.concatenate(
        [ordered_history(state), rows.astype(state.ring.dtype)], axis=0
    )  # [depth+F, fft], ring storage dtype (bf16 in power_bf16 mode)
    cs = jnp.concatenate(
        [
            jnp.zeros((1, fft), jnp.float32),
            jnp.cumsum(all_rows.astype(jnp.float32), axis=0),  # sums stay f32
        ],
        axis=0,
    )
    sums = cs[depth + 1 : depth + 1 + f] - cs[1 : 1 + f]  # [F, fft]
    frames = jnp.minimum(state.frames + 1 + jnp.arange(f, dtype=jnp.int32), depth)
    means = jnp.where(
        (frames >= depth)[:, None], sums / depth, jnp.float32(NO_DATA)
    )
    new_state = AveragerState(
        ring=all_rows[f : f + depth],
        total=sums[-1],
        pos=jnp.asarray(0, dtype=jnp.int32),
        frames=frames[-1],
    )
    return new_state, means


def ordered_history(state: AveragerState) -> jnp.ndarray:
    """Ring rows oldest-first, matching the reference deque layout
    (averager.cpp data())."""
    depth = state.ring.shape[0]
    idx = (state.pos + jnp.arange(depth)) % depth
    return state.ring[idx]
