"""Whole-block carry forms vs the sequential per-frame steps.

noise_block must be BIT-identical to folding noise_step (max is
order-independent); averager_block may differ by f32 sum-order ulps from
the running-total form but must agree to tight tolerance and produce the
same ring contents.
"""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.averager import (
    averager_block,
    averager_step,
    init_averager_state,
    ordered_history,
)
from rtl_sdr_scanner_tpu.ops.noise import init_noise_state, noise_block, noise_step

FFT = 64


def _noise_fold(state, power, now, learn):
    outs = []
    for k in range(power.shape[0]):
        state, out = noise_step(state, power[k], now[k], learn)
        outs.append(out)
    return state, jnp.stack(outs)


def test_noise_block_bit_identical_to_sequential():
    rng = np.random.default_rng(0)
    learn = 2000
    # block boundary scenarios: all-learning, transition inside, all-ready
    for start_ms, frame0_ms in [(0, 100), (0, 1500), (0, 2500), (0, 5000)]:
        power = jnp.asarray(rng.standard_normal((8, FFT)).astype(np.float32) * 20)
        now = jnp.asarray((frame0_ms + 400 * np.arange(8)).astype(np.int32))
        s0 = init_noise_state(FFT, start_ms)
        s_seq, out_seq = _noise_fold(s0, power, now, learn)
        s_blk, out_blk = noise_block(s0, power, now, learn)
        np.testing.assert_array_equal(np.asarray(out_seq), np.asarray(out_blk))
        np.testing.assert_array_equal(np.asarray(s_seq.threshold), np.asarray(s_blk.threshold))
        assert bool(s_seq.ready) == bool(s_blk.ready)

    # continuing from a ready state
    s0 = init_noise_state(FFT, 0)
    power = jnp.asarray(rng.standard_normal((4, FFT)).astype(np.float32))
    s_ready, _ = noise_block(s0, power, jnp.asarray([500, 1000, 1500, 2500], jnp.int32), 2000)
    power2 = jnp.asarray(rng.standard_normal((4, FFT)).astype(np.float32))
    now2 = jnp.asarray([3000, 3500, 4000, 4500], jnp.int32)
    s_a, out_a = _noise_fold(s_ready, power2, now2, 2000)
    s_b, out_b = noise_block(s_ready, power2, now2, 2000)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(s_a.threshold), np.asarray(s_b.threshold))


def test_averager_block_matches_sequential():
    rng = np.random.default_rng(1)
    depth = 5
    s_seq = init_averager_state(FFT, depth)
    s_blk = init_averager_state(FFT, depth)
    for _ in range(3):  # cross the warmup boundary and keep going
        rows = jnp.asarray(rng.standard_normal((4, FFT)).astype(np.float32))
        means_seq = []
        for k in range(4):
            s_seq, mean = averager_step(s_seq, rows[k])
            means_seq.append(mean)
        means_seq = np.stack([np.asarray(x) for x in means_seq])
        s_blk, means_blk = averager_block(s_blk, rows)
        np.testing.assert_allclose(means_seq, np.asarray(means_blk), atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(ordered_history(s_seq)), np.asarray(ordered_history(s_blk))
        )
        assert int(s_seq.frames) == int(s_blk.frames)
