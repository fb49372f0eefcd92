"""Polyphase channelizer: streaming == offline model, tone routing, and
feeding channelized sub-bands into the scan pipeline."""

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.channelizer import (
    ChannelizerState,
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


def test_oversampled_matches_offline_oracle():
    """2x bank == mix->filter->decimate-by-B/2 oracle (one-sample stream
    delay accounted: out[k] = filtered[(k-1) * B/2])."""
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        Channelizer2xState,
        channelize_block_2x,
        init_channelizer2x_state,
    )

    b = 8
    plan = plan_channelizer(b, oversample=2)
    rng = np.random.default_rng(5)
    n = b * 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    state = init_channelizer2x_state(plan)
    _, out = channelize_block_2x(plan, state, jnp.asarray(x))
    out = np.asarray(out)  # [B, 2 * n // B]

    # rebuild the prototype from the branch kernels (like offline_channelize)
    proto_rev = plan.branch_kernels[:, ::-1]
    n_taps = plan.taps_per_branch
    g = np.zeros(n_taps * b)
    for p in range(b):
        for j in range(n_taps):
            idx = j * b - p + (b - 1)
            if 0 <= idx < len(g):
                g[idx] = proto_rev[p, j]
    h = g[b - 1 :]

    ns = np.arange(n)
    hop = b // 2
    for ch in range(b):
        mixed = x * np.exp(-2j * np.pi * ch * ns / b)
        filtered = np.convolve(mixed, h)[:n]
        ref = filtered[0 : (2 * n // b - 1) * hop : hop]
        np.testing.assert_allclose(out[ch, 1:], ref, atol=2e-4)


def test_oversampled_streaming_equals_offline():
    """Block-streamed 2x outputs equal one whole-capture pass."""
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        channelize_block_2x,
        init_channelizer2x_state,
    )

    b = 8
    plan = plan_channelizer(b, oversample=2)
    rng = np.random.default_rng(6)
    n = b * 512
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    state = init_channelizer2x_state(plan)
    _, whole = channelize_block_2x(plan, state, jnp.asarray(x))

    state = init_channelizer2x_state(plan)
    parts = []
    step = n // 4
    for i in range(4):
        state, part = channelize_block_2x(plan, state, jnp.asarray(x[i * step : (i + 1) * step]))
        parts.append(np.asarray(part))
    streamed = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(streamed, np.asarray(whole), atol=1e-5)


def test_oversampled_edge_signal_flat():
    """A tone at the exact boundary between two channels passes at ~unity
    gain in the 2x bank (it sits inside the widened flat passband), while
    the critically-sampled bank attenuates it (its documented blind spot)."""
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        channelize_block_2x,
        init_channelizer2x_state,
    )

    b = 8
    n = b * 4096
    ns = np.arange(n)
    f_edge = 1.5 / b  # boundary between channels 1 and 2 (units of R)
    x = np.exp(2j * np.pi * f_edge * ns).astype(np.complex64)

    plan2 = plan_channelizer(b, oversample=2)
    st2 = init_channelizer2x_state(plan2)
    _, out2 = channelize_block_2x(plan2, st2, jnp.asarray(x))
    amp2 = np.abs(np.asarray(out2)[1, 200:]).mean()  # channel 1, post-startup

    plan1 = plan_channelizer(b)
    st1 = init_channelizer_state(plan1)
    _, out1 = channelize_block(plan1, st1, jnp.asarray(x))
    amp1 = np.abs(np.asarray(out1)[1, 200:]).mean()

    assert amp2 > 0.9, amp2  # flat in the widened passband
    assert amp1 < 0.6, amp1  # attenuated at the critical bank's edge


def test_matmul_bank_equals_conv_fft_bank():
    """The chunked-matmul production path must match the grouped-conv+fft
    oracle form block by block, including the streaming tail carry."""
    from rtl_sdr_scanner_tpu.ops.channelizer import (
        channelize_block,
        init_channelizer_state,
        plan_channelizer,
    )

    for b in (4, 8, 16):
        plan = plan_channelizer(b)
        assert plan.mm_plan is not None, b
        plan_ref = plan._replace(mm_plan=None)  # forces the conv+fft form
        rng = np.random.default_rng(40 + b)
        st_mm = init_channelizer_state(plan)
        st_ref = init_channelizer_state(plan_ref)
        for blk in range(3):
            n = b * 512
            x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
                np.complex64
            )
            st_mm, ch_mm = channelize_block(plan, st_mm, jnp.asarray(x))
            st_ref, ch_ref = channelize_block(plan_ref, st_ref, jnp.asarray(x))
            np.testing.assert_allclose(
                np.asarray(ch_mm), np.asarray(ch_ref), atol=2e-5, rtol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(st_mm.tail), np.asarray(st_ref.tail), atol=1e-6
            )


def test_channelizer_bf16_snr_bound():
    """tunables.channelizer_bf16 contract: the bf16-operand bank output
    matches the f32 bank within >= 45 dB aggregate SNR on a multitone
    scene. Bound reasoning: channel IQ quantized at 2^-9 relative (~54 dB)
    plus the quantized-tap stopband floor (~-52 dB) -- both above the
    46 dB int8 wire floor, so recordings stay inside the >= 40 dB
    recording-fidelity contract."""
    b = 8
    plan32 = plan_channelizer(b)
    planbf = plan_channelizer(b, bf16=True)
    assert planbf.bf16 and not plan32.bf16
    n = 8 * 4096
    t = np.arange(n)
    x = 0.02 * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
    for f_rel, a in [(0.03, 0.3), (-0.11, 0.2), (0.27, 0.25)]:
        x = x + a * np.exp(2j * np.pi * f_rel * t)
    x = x.astype(np.complex64)
    _, c32 = channelize_block(plan32, init_channelizer_state(plan32), jnp.asarray(x))
    _, cbf = channelize_block(planbf, init_channelizer_state(planbf), jnp.asarray(x))
    a32, abf = np.asarray(c32), np.asarray(cbf)
    assert a32.shape == abf.shape
    resid = a32 - abf
    num = float((np.abs(a32) ** 2).sum())
    den = float((np.abs(resid) ** 2).sum())
    assert den > 0  # bf16 mode actually engaged (not bit-identical)
    snr = 10 * np.log10(num / den)
    assert snr >= 45.0, f"bf16 bank SNR {snr:.1f} dB"
