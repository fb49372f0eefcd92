"""Numeric tests for the device-side detection ops against independent numpy
models of the reference semantics (psd.cpp, noise_learner.cpp, averager.cpp,
utils.cpp average)."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.constants import NO_DATA
from rtl_sdr_scanner_tpu.ops.averager import (
    averager_step,
    init_averager_state,
    ordered_history,
)
from rtl_sdr_scanner_tpu.ops.noise import init_noise_state, noise_step
from rtl_sdr_scanner_tpu.ops.psd import dequantize_cs8, frame_blocks, psd_frames
from rtl_sdr_scanner_tpu.ops.smooth import sliding_average
from rtl_sdr_scanner_tpu.ops.spectrogram import accumulate_frames, spectrogram_output_size
from rtl_sdr_scanner_tpu.utils.utils import sliding_average as np_sliding_average

RNG = np.random.default_rng(42)


def test_psd_matches_numpy_model():
    fft = 256
    rate = 2048000.0
    frames = (RNG.standard_normal((3, fft)) + 1j * RNG.standard_normal((3, fft))).astype(
        np.complex64
    )
    got = np.asarray(psd_frames(jnp.asarray(frames), rate))

    win = np.hamming(fft)
    spec = np.fft.fftshift(np.fft.fft(frames * win, axis=-1), axes=-1)
    expected = 10.0 * np.log10(np.abs(spec) ** 2 / rate)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-3)


def test_frame_blocks_keeps_first_of_each_group():
    fft, decim, n = 8, 3, 4
    iq = np.arange(fft * decim * n).astype(np.complex64)
    out = np.asarray(frame_blocks(jnp.asarray(iq), fft, decim))
    assert out.shape == (n, fft)
    for k in range(n):
        np.testing.assert_array_equal(out[k].real, np.arange(k * fft * decim, k * fft * decim + fft))


def test_dequantize_cs8():
    raw = np.array([[127, -127], [0, 64]], dtype=np.int8)
    out = np.asarray(dequantize_cs8(jnp.asarray(raw)))
    np.testing.assert_allclose(out, [127 / 127.5 - 1j * 127 / 127.5, 0 + 64j / 127.5], rtol=1e-6)


def test_noise_learner_reference_semantics():
    fft = 16
    learn_ms = 2000
    state = init_noise_state(fft, start_ms=1000)
    frames = RNG.standard_normal((6, fft)).astype(np.float32) * 5

    # frames at 1000,1500,2000,2500,3000,3500 ms; ready transition at
    # start+2000 <= now -> frame at 3000 ms completes learning (sentinel out),
    # frames after subtract the frozen max-hold.
    times = [1000, 1500, 2000, 2500, 3000, 3500]
    outs = []
    for f, t in zip(frames, times):
        state, out = noise_step(state, jnp.asarray(f), jnp.asarray(t), learn_ms)
        outs.append(np.asarray(out))

    for out in outs[:5]:
        np.testing.assert_array_equal(out, np.full(fft, NO_DATA, np.float32))
    threshold = frames[:5].max(axis=0)  # max-hold includes the completing frame
    np.testing.assert_allclose(outs[5], frames[5] - threshold, rtol=1e-6)


def test_averager_reference_semantics():
    fft, depth = 8, 4
    state = init_averager_state(fft, depth)
    frames = RNG.standard_normal((7, fft)).astype(np.float32)
    outs = []
    for f in frames:
        state, mean = averager_step(state, jnp.asarray(f))
        outs.append(np.asarray(mean))

    # sentinel until `depth` frames pushed (averager.cpp:52-60)
    for out in outs[: depth - 1]:
        np.testing.assert_array_equal(out, np.full(fft, NO_DATA, np.float32))
    for k in range(depth - 1, 7):
        expected = frames[k - depth + 1 : k + 1].mean(axis=0)
        np.testing.assert_allclose(outs[k], expected, rtol=1e-5)

    # history is oldest-first, matching the reference deque
    hist = np.asarray(ordered_history(state))
    np.testing.assert_allclose(hist, frames[-depth:], rtol=1e-6)


def test_averager_reset_semantics():
    """Reset (retune) re-zeros the ring and restores the warmup sentinel
    (reference averager.cpp:27-34; tests/test_averager.cpp reset case)."""
    fft, depth = 8, 4
    state = init_averager_state(fft, depth)
    frames = RNG.standard_normal((5, fft)).astype(np.float32)
    for f in frames:
        state, mean = averager_step(state, jnp.asarray(f))
    assert not np.any(np.asarray(mean) == NO_DATA)

    state = init_averager_state(fft, depth)  # reset == fresh state
    state, mean = averager_step(state, jnp.asarray(frames[0]))
    np.testing.assert_array_equal(np.asarray(mean), np.full(fft, NO_DATA, np.float32))


def test_sliding_average_matches_host_and_reference():
    data = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], dtype=np.float32)
    got = np.asarray(sliding_average(jnp.asarray(data), 5))
    np.testing.assert_allclose(got, [2, 2.5, 3, 4, 5, 6, 7, 7.5, 8], rtol=1e-6)
    batched = RNG.standard_normal((3, 33)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sliding_average(jnp.asarray(batched), 21)),
        np_sliding_average(batched, 21),
        atol=1e-4,  # f32 cumsum vs f64 reference; means are near zero
    )


def test_spectrogram_accumulate():
    assert spectrogram_output_size(131072, 20480000) == 16384
    assert spectrogram_output_size(8192, 2048000) == 2048
    frames = RNG.standard_normal((5, 32)).astype(np.float32)
    out = np.asarray(accumulate_frames(jnp.asarray(frames), 8))
    expected = frames.reshape(5, 8, 4).mean(axis=-1).sum(axis=0)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_sliding_argmax_code_matches_pair_form():
    """sliding_argmax_code fuses (window max >= level, first-argmax offset)
    into one int8; it must agree with sliding_argmax + explicit compare at
    every center, including shrunken edge windows and ties."""
    from rtl_sdr_scanner_tpu.ops.detect import sliding_argmax, sliding_argmax_code

    rng = np.random.default_rng(0)
    n, half, level = 512, 51, 3.0
    rows = rng.normal(0.0, 4.0, size=(7, n)).astype(np.float32)
    # force plateaus/ties so the first-occurrence rule is exercised
    rows[:, 100:160] = np.repeat(rows[:, 100:160:4], 4, axis=1)
    rows[2, :] = 1.5  # entire row constant (all ties)
    rows[3, :] = level  # exactly at the level: >= keeps it valid

    bv, bi = sliding_argmax(jnp.asarray(rows), half)
    code = np.asarray(
        sliding_argmax_code(jnp.asarray(rows), half, jnp.float32(level))
    )
    bv, bi = np.asarray(bv), np.asarray(bi)
    centers = np.arange(n)
    valid = bv >= level
    assert ((code >= 0) == valid).all()
    np.testing.assert_array_equal(
        code[valid].astype(np.int32),
        (bi - (centers[None, :] - half))[valid],
    )
    # brute-force oracle on a few centers
    for c in (0, 1, half, 130, n - half, n - 1):
        lo, hi = max(0, c - half), min(n, c + half + 1)
        win = rows[:, lo:hi]
        np.testing.assert_array_equal(bi[:, c], lo + np.argmax(win, axis=1))
        np.testing.assert_array_equal(bv[:, c], np.max(win, axis=1))


def test_sliding_argmax_code_bf16_mode():
    """bf16 rows keep working through the code form (tolerance mode)."""
    from rtl_sdr_scanner_tpu.ops.detect import sliding_argmax_code

    rng = np.random.default_rng(1)
    rows = rng.normal(0.0, 4.0, size=(3, 256)).astype(np.float32)
    rows_bf = jnp.asarray(rows).astype(jnp.bfloat16)
    code = np.asarray(sliding_argmax_code(rows_bf, 11, jnp.float32(2.0)))
    # decode against a bf16 numpy model
    import ml_dtypes

    rows_np = rows.astype(ml_dtypes.bfloat16).astype(np.float32)
    for c in (0, 50, 255):
        lo, hi = max(0, c - 11), min(256, c + 12)
        win = rows_np[:, lo:hi]
        mx = win.max(axis=1)
        exp_valid = mx >= 2.0
        np.testing.assert_array_equal(code[:, c] >= 0, exp_valid)
        got = (c - 11) + code[:, c].astype(np.int32)
        want = lo + np.argmax(win, axis=1)
        np.testing.assert_array_equal(got[exp_valid], want[exp_valid])
