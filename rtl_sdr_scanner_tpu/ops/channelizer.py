"""Polyphase analysis channelizer: one wideband stream -> B sub-band streams.

The reference can only watch sample_rate of spectrum at a time and
time-multiplexes wider ranges with 500 ms dwells (scanner.cpp:46-60). A TPU
has the FLOPs to watch EVERYTHING: this critically-sampled DFT filter bank
splits one rate-R wideband capture into B channels of rate R/B, each of which
feeds an independent band-scan pipeline (concurrent bands on one chip /
across a mesh) -- the north-star upgrade in SURVEY.md section 2.

Math (channel b, center +b*R/B, wrapped to +-R/2):
  y_b[m] = sum_p e^{-j2pi b p / B} * (x_p conv h_p)[m]
  with branch signals x_p[m] = x[mB + p] and branch filters
  h_p[j] = h[jB - p] of a prototype low-pass h (Kaiser, cutoff R/2B).
  The DFT over p is a length-B FFT -- MXU/VPU friendly; the branch convs are
  one grouped strided convolution.

Streaming: an input-domain tail (overlap-save) carries across blocks, same
scheme as ops/ddc.py, so block-streamed output equals offline filtering.

Caveat: critically-sampled banks attenuate signals straddling channel edges;
pick B so channel width >= a few signal bandwidths (or scan overlapping
center offsets), just as reference hop-range edges clip signals.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.ddc import firdes_low_pass


class ChannelizerPlan(NamedTuple):
    num_channels: int
    taps_per_branch: int
    branch_kernels: np.ndarray  # [B, taps_per_branch] f32, conv-ready (reversed)
    tail_len: int  # input samples carried between blocks
    # chunked-matmul form (the DDC stage-1 machinery, ops/ddc.py): channel b
    # is a decimate-by-B FIR over the raw stream with the complex kernel
    # G[b, t*B + p] = W[b, p] * branch_kernel[p, t] (W = exp(-2j pi b p / B)),
    # which _modtap_stage1 runs as ONE [.., C] @ [C, B*2*D*P] MXU contraction
    # with B*2*D*P real output columns -- the utilization the 8-channel dense
    # conv could not reach (BENCH.md negative result). g_pad/idx are small
    # host constants; the weight matrix is assembled in-jit.
    mm_plan: object  # ops/ddc.StagePlan for (decim=B, r_rows=T) or None
    mm_g_pad: np.ndarray  # [B, 2, T*B + 1] f32 complex kernels (+ zero slot)
    mm_idx: np.ndarray  # [C, D*P] int32 scatter index
    # tolerance mode (tunables.channelizer_bf16): run the bank contraction
    # with bf16 OPERANDS (f32 accumulation). The bank is f32-MXU
    # compute-bound (~1 TFLOP per 8x20 block, BENCH.md round-5), so bf16
    # buys the MXU rate back at a bounded cost: channel IQ quantized at
    # 2^-9 relative (~54 dB SNR, above the 46 dB int8 wire floor) and the
    # quantized-tap stopband floor rises to ~-52 dB (was ~-70; still past
    # the >= 40 dB recording contract). Pinned by
    # tests/test_channelizer.py::test_channelizer_bf16_snr_bound.
    bf16: bool = False


@functools.lru_cache(maxsize=16)
def plan_channelizer(
    num_channels: int,
    taps_per_branch: int = 0,
    oversample: int = 1,
    bf16: bool = False,
) -> ChannelizerPlan:
    """Design the prototype and split it into branch filters.

    Prototype: Kaiser low-pass, gain 1 (same firdes as the DDC chain).
    Critically sampled (oversample=1): cutoff at half the channel spacing,
    20% transition. 2x-oversampled: the output Nyquist doubles, so the
    passband WIDENS to cover the whole +-half-spacing core flat
    (cutoff 0.7, transition 0.35 of the spacing; stopband at ~0.875 is
    still inside the 2x alias-free zone) -- edge-straddling signals stay
    unattenuated in the channel that owns them.
    """
    b = num_channels
    cutoff, trans = (0.5, 0.2) if oversample == 1 else (0.7, 0.35)
    proto = firdes_low_pass(
        gain=1.0,
        sampling_freq=float(b),
        cutoff=cutoff,
        transition_width=trans,
    )
    # branch filters h_p[j] = h[j*B - p]; front-pad so j starts at 0
    g = np.concatenate([np.zeros(b - 1), proto])
    n_taps = -(-(len(proto) + b - 1) // b)
    kernels = np.zeros((b, n_taps), dtype=np.float64)
    for p in range(b):
        for j in range(n_taps):
            idx = j * b - p + (b - 1)
            if 0 <= idx < len(g):
                kernels[p, j] = g[idx]
    # conv implementation is cross-correlation with reversed kernels
    kernels = kernels[:, ::-1].copy()
    tail_rows = n_taps - 1
    tail_len = tail_rows * b

    # chunked-matmul form: forward kernels G[b, t*B + p] = W[b,p] k[p,t].
    # Window algebra (see channelize_block_mm): with r_rows = n_taps,
    # tail_len = (T-1)*B and g_rev := G (NO extra reversal), the stage's
    # output mm equals sum_u G[u] * ext[mm*B + u] -- exactly the conv+fft
    # channels. f64 table math, f32 cast.
    from rtl_sdr_scanner_tpu.ops.ddc import (
        StagePlan,
        _modtap_scatter_index,
        _plan_chunk_matmul,
    )

    bb, pp_ = np.meshgrid(np.arange(b), np.arange(b), indexing="ij")
    w_dft = np.exp(-2j * np.pi * bb * pp_ / b)  # [B, B]
    g = np.zeros((b, n_taps * b), dtype=np.complex128)
    for p in range(b):
        for t in range(n_taps):
            g[:, t * b + p] = w_dft[:, p] * kernels[p, t]
    g_pad = np.concatenate(
        [
            np.stack([g.real, g.imag], axis=1),
            np.zeros((b, 2, 1)),
        ],
        axis=-1,
    ).astype(np.float32)

    c, d, q, _ = _plan_chunk_matmul(b, n_taps, np.zeros(n_taps * b), tail_len)
    if c > 0:
        mm_plan = StagePlan(
            1, b, n_taps * b, tail_len,
            np.zeros(1, np.float32), np.zeros((1, 1, 1), np.float32),
            n_taps, c, d, q, np.zeros((0, 0), np.float32),
        )
        mm_idx = np.asarray(_modtap_scatter_index(b, n_taps, tail_len, c, d, q))
    else:  # pragma: no cover - every pow2 B fits the matmul form
        mm_plan, mm_idx = None, np.zeros((0, 0), np.int32)

    return ChannelizerPlan(
        num_channels=b,
        taps_per_branch=n_taps,
        branch_kernels=kernels.astype(np.float32),
        tail_len=tail_len,
        mm_plan=mm_plan,
        mm_g_pad=g_pad,
        mm_idx=mm_idx,
        bf16=bf16,
    )


class ChannelizerState(NamedTuple):
    # last input samples of the previous block as f32 (re, im) PAIRS:
    # complex64 must never exist at a jit boundary / as an eager device
    # array -- creating one outside jit breaks the axon TPU tunnel process
    # (see .claude/skills/verify/SKILL.md); complex math stays in-jit only
    tail: jnp.ndarray  # [tail_len, 2] f32


def init_channelizer_state(plan: ChannelizerPlan) -> ChannelizerState:
    return ChannelizerState(tail=jnp.zeros((plan.tail_len, 2), dtype=jnp.float32))


def channelize_block(
    plan: ChannelizerPlan, state: ChannelizerState, x: jnp.ndarray
) -> Tuple[ChannelizerState, jnp.ndarray]:
    """x: [n] complex64 (in-jit), n % B == 0 -> channels [B, n // B] complex64.

    Channel b is the sub-band centered at +b*R/B relative to the wideband
    center (b >= B/2 wraps negative). Production path: the chunked-matmul
    form (one MXU contraction, plan.mm_*); the grouped-conv + length-B fft
    form below is the fallback/oracle (tests pin their equality)."""
    b = plan.num_channels
    n = x.shape[0]
    assert n % b == 0, (n, b)
    if plan.mm_plan is not None:
        return _channelize_block_mm(plan, state, x)
    tail_c = jax.lax.complex(state.tail[:, 0], state.tail[:, 1])
    ext = jnp.concatenate([tail_c, x])
    rows = ext.reshape(-1, b)  # rows[m, p] = ext[m*B + p]
    branches = rows.T  # [B, M] branch signals x_p
    kernels = jnp.asarray(plan.branch_kernels)

    def conv_part(sig_part):
        # grouped conv: each branch filtered by its own kernel, VALID.
        # Negative result kept for the record (BENCH.md): folding the
        # length-B DFT into dense [B, B, T] kernels to make this "MXU
        # friendly" measured 1.5x SLOWER on v5e (365 -> 243 Msamples/s
        # wideband app path) -- an 8-channel conv pads the channel dim to
        # 128 lanes at 6% utilization, worse than grouped conv + fft.
        lhs = sig_part[None]  # [1, B, M]
        rhs = kernels[:, None, :]  # [B out, 1 in/group, T]
        return jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=b,
        )[0]

    v = conv_part(jnp.real(branches)) + 1j * conv_part(jnp.imag(branches))
    # v: [B, n//B]; DFT over the branch axis gives the channels
    channels = jnp.fft.fft(v, axis=0).astype(jnp.complex64)
    new_tail = ext[-plan.tail_len :]
    return (
        ChannelizerState(
            tail=jnp.stack([jnp.real(new_tail), jnp.imag(new_tail)], axis=-1)
        ),
        channels,
    )


def _channelize_block_mm(
    plan: ChannelizerPlan, state: ChannelizerState, x: jnp.ndarray
) -> Tuple[ChannelizerState, jnp.ndarray]:
    """Chunked-matmul bank: channels[b, m] = sum_u G[b, u] ext[m*B + u] with
    ext = [carried tail, x] -- run by the DDC's _modtap_stage1 as one
    [.., C] @ [C, B*2*D*P] contraction (B*2*D*P real output columns feed the
    MXU properly; the 8-channel conv/fft forms could not)."""
    from rtl_sdr_scanner_tpu.ops.ddc import _modtap_stage1

    b = plan.num_channels
    p0 = plan.mm_plan
    gp = jnp.asarray(plan.mm_g_pad)  # [B, 2, RM+1] small host constant
    w = jnp.moveaxis(gp[:, :, plan.mm_idx], 2, 0).reshape(
        p0.chunk_c, b * 2 * plan.mm_idx.shape[1]
    )
    xs = jnp.stack([jnp.real(x), jnp.imag(x)], axis=0)  # [2, n]
    y_re, y_im, new_tail = _modtap_stage1(
        xs[None], state.tail.T[None], w[None], p0, b, bf16=plan.bf16
    )
    channels = jax.lax.complex(y_re[0], y_im[0])  # [B, n // B]
    return ChannelizerState(tail=new_tail[0].T), channels


def channelize_block_pairs(
    plan: ChannelizerPlan, state: ChannelizerState, x_pairs: jnp.ndarray
) -> Tuple[ChannelizerState, jnp.ndarray]:
    """channelize_block with f32 (re, im) pairs at both boundaries.

    x_pairs: [n, 2] f32 (or int8 cs8, dequantized in-jit at 1/127.5 like
    native.cs8_to_complex64 -- quarter h2d bandwidth for cs8 captures)
    -> channels [B, n // B, 2] f32. complex64 never crosses the
    host<->device boundary (unimplemented on the axon tunnel and never
    needed: the downstream scan/DDC pipelines consume pairs natively).
    """
    if x_pairs.dtype == jnp.int8:
        x_pairs = x_pairs.astype(jnp.float32) * (1.0 / 127.5)
    x = jax.lax.complex(x_pairs[:, 0], x_pairs[:, 1])
    state, channels = channelize_block(plan, state, x)
    return state, jnp.stack([jnp.real(channels), jnp.imag(channels)], axis=-1)


# -- 2x-oversampled analysis bank -------------------------------------------
#
# The critically-sampled bank attenuates signals straddling channel edges
# (the module caveat above). Oversampling by 2 makes each channel's output
# rate 2R/B while its CORE range stays R/B wide: every frequency lies fully
# inside the passband of the channel whose core contains it, so edge signals
# are captured cleanly and range-gating dedups detections (each frequency
# belongs to exactly one core).
#
# Identity used: with hop h = B/2, the odd-phase outputs are a
# critically-sampled bank run on the stream DELAYED by h:
#   y_b(tB - h) = (-1)^b * bank(x delayed by h)[b, t]
# (the delay re-references the polyphase commutator; e^{-j pi b} is the
# half-stride phase). Interleaving [odd_t, even_t] yields the uniformly
# h-spaced stream ..., y(tB-h), y(tB), y(tB+h) [= odd_{t+1}], ... -- the
# whole output is delayed by h samples relative to the even bank, which is
# an irrelevant constant stream latency.


class Channelizer2xState(NamedTuple):
    even: ChannelizerState  # bank state on x
    odd: ChannelizerState  # bank state on x delayed by B/2
    # last B/2 input samples as f32 pairs (same jit-boundary rule as
    # ChannelizerState.tail)
    carry: jnp.ndarray  # [B/2, 2] f32


def init_channelizer2x_state(plan: ChannelizerPlan) -> Channelizer2xState:
    return Channelizer2xState(
        even=init_channelizer_state(plan),
        odd=init_channelizer_state(plan),
        carry=jnp.zeros((plan.num_channels // 2, 2), dtype=jnp.float32),
    )


def channelize_block_2x(
    plan: ChannelizerPlan, state: Channelizer2xState, x: jnp.ndarray
) -> Tuple[Channelizer2xState, jnp.ndarray]:
    """x: [n] complex64, n % B == 0 -> channels [B, 2 * n // B] complex64
    at TWICE the critically-sampled channel rate.

    The odd-phase bank consumes the stream delayed by B/2 (zero-primed on
    the very first block, matching a zero-history filter start), so both
    banks stay block-aligned with static shapes.
    """
    b = plan.num_channels
    h = b // 2
    n = x.shape[0]
    assert n % b == 0, (n, b)

    even_state, ch_even = channelize_block(plan, state.even, x)

    # odd bank input: x delayed by B/2 (previous block's tail; zeros before
    # the first block = standard zero-history filter start)
    carry_c = jax.lax.complex(state.carry[:, 0], state.carry[:, 1])
    x_odd = jnp.concatenate([carry_c, x[: n - h]])
    odd_state, ch_odd = channelize_block(plan, state.odd, x_odd)
    signs = jnp.where(np.arange(b) % 2 == 0, 1.0, -1.0).astype(np.float32)[:, None]
    ch_odd = ch_odd * signs

    m = n // b
    # odd sample y(tB - h) precedes even sample y(tB)
    out = jnp.stack([ch_odd, ch_even], axis=-1).reshape(b, 2 * m)
    new_carry = x[n - h :]
    return (
        Channelizer2xState(
            even=even_state,
            odd=odd_state,
            carry=jnp.stack([jnp.real(new_carry), jnp.imag(new_carry)], axis=-1),
        ),
        out,
    )


def channelize_block_2x_pairs(
    plan: ChannelizerPlan, state: Channelizer2xState, x_pairs: jnp.ndarray
) -> Tuple[Channelizer2xState, jnp.ndarray]:
    """channelize_block_2x with f32 (re, im) pairs (or int8 cs8, dequantized
    in-jit) at both boundaries."""
    if x_pairs.dtype == jnp.int8:
        x_pairs = x_pairs.astype(jnp.float32) * (1.0 / 127.5)
    x = jax.lax.complex(x_pairs[:, 0], x_pairs[:, 1])
    state, channels = channelize_block_2x(plan, state, x)
    return state, jnp.stack([jnp.real(channels), jnp.imag(channels)], axis=-1)


def channel_center_offsets(plan: ChannelizerPlan, sample_rate: int) -> np.ndarray:
    """Per-channel frequency offset from the wideband center (Hz), wrapped."""
    b = plan.num_channels
    k = np.arange(b)
    k = np.where(k <= b // 2, k, k - b)
    return (k * sample_rate // b).astype(np.int64)


def offline_channelize(plan: ChannelizerPlan, x: np.ndarray) -> np.ndarray:
    """Numpy reference model: per-channel downconvert -> filter -> decimate."""
    b = plan.num_channels
    proto = plan.branch_kernels[:, ::-1]  # un-reverse
    # rebuild the prototype from branches for the reference path
    n_taps = plan.taps_per_branch
    g = np.zeros(n_taps * b)
    for p in range(b):
        for j in range(n_taps):
            idx = j * b - p + (b - 1)
            if 0 <= idx < len(g):
                g[idx] = proto[p, j]
    h = g[b - 1 :]
    n = len(x)
    out = np.zeros((b, n // b), dtype=np.complex128)
    ns = np.arange(n)
    for ch in range(b):
        mixed = x * np.exp(-2j * np.pi * ch * ns / b)
        filtered = np.convolve(mixed, h)[:n]
        out[ch] = filtered[0::b][: n // b]  # y_b[m] = (mixed conv h)[m*B]
    return out
