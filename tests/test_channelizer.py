"""Polyphase channelizer: streaming == offline model, tone routing, and
feeding channelized sub-bands into the scan pipeline."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.channelizer import (
    channel_center_offsets,
    channelize_block,
    init_channelizer_state,
    offline_channelize,
    plan_channelizer,
)

RNG = np.random.default_rng(8)


def test_streaming_equals_offline():
    plan = plan_channelizer(8)
    n_blocks, block = 4, 4096
    x = (RNG.standard_normal(block * n_blocks) + 1j * RNG.standard_normal(block * n_blocks)).astype(
        np.complex64
    )
    state = init_channelizer_state(plan)
    outs = []
    for i in range(n_blocks):
        state, ch = channelize_block(plan, state, jnp.asarray(x[i * block : (i + 1) * block]))
        outs.append(np.asarray(ch))
    got = np.concatenate(outs, axis=1)
    ref = offline_channelize(plan, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_tone_routes_to_its_channel():
    b = 8
    rate = 2_048_000
    plan = plan_channelizer(b)
    ch_width = rate // b  # 256 kHz
    offsets = channel_center_offsets(plan, rate)
    n = 1 << 16
    t = np.arange(n) / rate

    for f_tone, expect_ch in ((500_000, 2), (-750_000, 5), (10_000, 0)):
        x = 0.5 * np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
        state = init_channelizer_state(plan)
        _, ch = channelize_block(plan, state, jnp.asarray(x))
        ch = np.asarray(ch)[:, 64:]  # skip filter warmup
        powers = np.mean(np.abs(ch) ** 2, axis=1)
        got_ch = int(np.argmax(powers))
        assert got_ch == expect_ch, (f_tone, got_ch, powers)
        # tone lands at the right baseband offset within its channel
        spec = np.abs(np.fft.fft(ch[got_ch]))
        k = int(np.argmax(spec))
        f_base = k / len(ch[got_ch]) * ch_width
        if f_base > ch_width / 2:
            f_base -= ch_width
        assert abs(f_base - (f_tone - offsets[got_ch])) < 200, (f_tone, f_base)
        # energy is confined: other channels far down
        others = np.delete(powers, got_ch)
        assert powers[got_ch] / max(others.max(), 1e-12) > 100


def test_channel_center_offsets():
    plan = plan_channelizer(8)
    offs = channel_center_offsets(plan, 2_048_000)
    assert list(offs) == [0, 256000, 512000, 768000, 1024000, -768000, -512000, -256000]


def test_channelized_band_feeds_scan_pipeline():
    """End of the wideband story: channelize a 2.048 Msps capture with an NFM
    signal at +500 kHz, then detect it in channel 2's own scan pipeline."""
    from rtl_sdr_scanner_tpu.models.scan_pipeline import (
        ScanConfig,
        init_scan_state,
        make_scan_step,
    )
    from rtl_sdr_scanner_tpu.ops.smooth import sliding_average

    b = 8
    rate = 2_048_000
    sub_rate = rate // b  # 256 kHz
    plan = plan_channelizer(b)
    secs = 4.0
    n = int(rate * secs) // b * b
    t = np.arange(n) / rate
    x = 0.01 * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
    audio = np.sin(2 * np.pi * 900 * t)
    phase = 2 * np.pi * 500_000 * t + 2 * np.pi * 3000 * np.cumsum(audio) / rate
    x += 0.4 * np.exp(1j * phase) * (t >= 2.2)
    x = x.astype(np.complex64)

    state = init_channelizer_state(plan)
    _, channels = channelize_block(plan, state, jnp.asarray(x))
    sub = np.asarray(channels)[2]  # centered at +512 kHz

    cfg = ScanConfig.create(sub_rate, frames_per_block=8)
    step_fn = make_scan_step(cfg)
    ss = init_scan_state(cfg, 0)
    group = cfg.fft_size * cfg.decimator_factor
    n_blocks = len(sub) // cfg.block_samples
    frame_ms = cfg.frame_interval_ms
    last = None
    for blk in range(n_blocks):
        seg = sub[blk * cfg.block_samples : (blk + 1) * cfg.block_samples]
        framed = jnp.asarray(seg.reshape(cfg.frames_per_block, group))
        now = ((blk * cfg.frames_per_block + 1 + np.arange(cfg.frames_per_block)) * frame_ms
               ).astype(np.int32)
        ss, outs = step_fn(ss, framed, jnp.asarray(now))
        last = np.asarray(outs.avg)[-1]

    peak = int(np.argmax(last))
    # +500 kHz is -12 kHz from channel 2's +512 kHz center
    found = cfg.index_to_shift(peak)
    assert abs(found - (-12_000)) < 3000, (found, last[peak])
    assert last[peak] > 8.0
