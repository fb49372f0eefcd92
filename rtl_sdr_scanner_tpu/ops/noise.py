"""Noise-floor learner (device side, functional state).

Replaces the reference NoiseLearner block (sources/radio/blocks/noise_learner.cpp):
per hop-frequency max-hold over PSD bins for NOISE_LEARNING_TIME, then
output = power - threshold (dB above floor). While learning -- including the
frame on which learning completes -- the output is the NO_DATA sentinel.

The reference keys state by center frequency (noise_learner.cpp:42,
map<Frequency, Noise>); here each band carries its own NoiseState in the scan
pipeline carry, and the host holds one state pytree per hop range
(runtime/sdr_device.py), which is the same keying made explicit.

Time is an input (now_ms per frame), never wall clock, so the pipeline is
jit-safe and replay-deterministic.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from rtl_sdr_scanner_tpu.constants import NO_DATA


class NoiseState(NamedTuple):
    threshold: jnp.ndarray  # [fft] f32 max-hold; -inf until learned
    ready: jnp.ndarray  # scalar bool
    start_ms: jnp.ndarray  # scalar i32: first-frame arrival time

    # NOTE: all now_ms/start_ms values are milliseconds RELATIVE to the
    # session epoch (int32-safe under jit without x64; the host runtime keeps
    # the absolute epoch and converts at the egress boundary).


def init_noise_state(fft_size: int, start_ms) -> NoiseState:
    """Fresh state; start_ms is the arrival time of the first frame
    (reference Noise() ctor stamps construction time, noise_learner.cpp:9)."""
    return NoiseState(
        threshold=jnp.full((fft_size,), -jnp.inf, dtype=jnp.float32),
        ready=jnp.asarray(False),
        start_ms=jnp.asarray(start_ms, dtype=jnp.int32),
    )


def noise_step(
    state: NoiseState, power: jnp.ndarray, now_ms: jnp.ndarray, learning_time_ms: int
) -> Tuple[NoiseState, jnp.ndarray]:
    """One frame through the learner.

    Reference semantics (noise_learner.cpp:11-28, 43-59):
    - not ready: threshold = max(threshold, power); becomes ready when
      start + learning_time <= now; output sentinel either way.
    - ready: threshold frozen; output power - threshold.
    """
    was_ready = state.ready
    threshold = jnp.where(was_ready, state.threshold, jnp.maximum(state.threshold, power))
    ready = was_ready | (state.start_ms + learning_time_ms <= now_ms)
    out = jnp.where(was_ready, power - threshold, jnp.full_like(power, NO_DATA))
    return NoiseState(threshold=threshold, ready=ready, start_ms=state.start_ms), out


def noise_block(
    state: NoiseState, power: jnp.ndarray, now_ms: jnp.ndarray, learning_time_ms: int
) -> Tuple[NoiseState, jnp.ndarray]:
    """All frames of a block at once -- BIT-IDENTICAL to folding noise_step
    over the frames (max is order-independent), without the per-frame
    lax.scan iteration overhead.

    power: [F, fft]; now_ms: [F] i32 nondecreasing (block frame times).

    The readiness recurrence only depends on time, and frames are
    nondecreasing in time, so the learning frames form a prefix: the frozen
    threshold every ready frame sees is max(threshold_in, learning-prefix
    max-hold), one masked max over the block.
    """
    cond = state.start_ms + learning_time_ms <= now_ms  # [F], monotone
    # readiness ENTERING frame k = ready_in | cond_{k-1}
    was_ready = state.ready | jnp.concatenate(
        [jnp.zeros((1,), dtype=bool), cond[:-1]]
    )  # [F]
    learning = ~was_ready
    held = jnp.max(
        jnp.where(learning[:, None], power, -jnp.inf), axis=0, initial=-jnp.inf
    )
    threshold = jnp.maximum(state.threshold, jnp.where(jnp.any(learning), held, -jnp.inf))
    out = jnp.where(
        was_ready[:, None], power - threshold[None, :], jnp.float32(NO_DATA)
    )
    ready = state.ready | cond[-1]
    return NoiseState(threshold=threshold, ready=ready, start_ms=state.start_ms), out
