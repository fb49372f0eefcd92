"""Digital down-converter: frequency shift + staged rational resampling.

Replaces the reference recorder chain rotator_cc -> rational_resampler cascade
-> complex_to_interleaved_char (sources/radio/recorder.cpp:21-40) with a
batched, maskable, streaming JAX program:

- K recorder slots are a batch dimension; dynamic recorder attach/detach
  (recorder.cpp:58-87) becomes masking -- the idiomatic fixed-shape answer.
- The NCO (rotator) is exact: per-sample angles come from int64 modular
  arithmetic on the host (two-level tables), so float32 never sees a large
  argument; phase continuity across blocks is carried.
- Each (interp L, decim M) stage -- factors from
  utils.radio_utils.get_resamplers_factors, reference radio_utils.cpp:129-152 --
  is one strided/dilated convolution (XLA lowers to MXU-friendly code), with
  an overlap-save input tail carried between blocks so block-streamed output
  equals offline filtering exactly.
- Filters are designed like GNU Radio's default rational_resampler taps
  (design_resampler_filter: Kaiser beta=7, fractional_bw=0.4), keeping the
  recording passband/SNR contract of the reference.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.window import kaiser
from rtl_sdr_scanner_tpu.utils.radio_utils import get_resamplers_factors

# ---------------------------------------------------------------------------
# Filter design (GR-compatible)
# ---------------------------------------------------------------------------


def firdes_low_pass(
    gain: float, sampling_freq: float, cutoff: float, transition_width: float, beta: float = 7.0
) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, GNU Radio firdes::low_pass semantics:
    odd tap count from the attenuation heuristic, DC-normalized to `gain`."""
    attenuation = beta / 0.1102 + 8.7
    ntaps = int(attenuation * sampling_freq / (22.0 * transition_width))
    if ntaps % 2 == 0:
        ntaps += 1
    m = (ntaps - 1) // 2
    w = kaiser(ntaps, beta)
    n = np.arange(-m, m + 1, dtype=np.float64)
    fw = 2.0 * np.pi * cutoff / sampling_freq
    denom = np.where(n == 0, 1.0, n * np.pi)
    taps = np.where(n == 0, fw / np.pi, np.sin(n * fw) / denom) * w
    dc = taps[m] + 2.0 * np.sum(taps[m + 1 :])
    return (taps * (gain / dc)).astype(np.float64)


@functools.lru_cache(maxsize=64)
def design_resampler_taps(interp: int, decim: int, fractional_bw: float = 0.4) -> np.ndarray:
    """GNU Radio rational_resampler default filter (design_resampler_filter)."""
    if interp == 1 and decim == 1:
        return np.ones(1, dtype=np.float64)
    halfband = 0.5
    rate = interp / decim
    if rate >= 1.0:
        trans_width = halfband - fractional_bw
        mid = halfband - trans_width / 2.0
    else:
        trans_width = rate * (halfband - fractional_bw)
        mid = rate * halfband - trans_width / 2.0
    return firdes_low_pass(interp, interp, mid, trans_width)


# ---------------------------------------------------------------------------
# Stage / chain plumbing
# ---------------------------------------------------------------------------


class StagePlan(NamedTuple):
    interp: int
    decim: int
    ntaps: int
    tail_len: int  # input-domain overlap-save tail: ceil((ntaps-1)/interp)
    kernel: np.ndarray  # reversed taps left-padded to tail_len*interp + 1 (f32)
    # decimation-only (interp==1) MXU form: the polyphase branches become M
    # input channels so the conv contracts over M*poly_taps (a C=1 W-only
    # conv contracts over 1 element at a time and crawls on the MXU)
    poly_kernel: np.ndarray  # [1, M, R] f32, kernel[0, r, q] = h_rev[q*M + r]
    poly_rows: int  # R
    # lane-aligned chunked-matmul form (the default TPU path, _stage_apply):
    # the block input sits at a 128-aligned offset Q >= tail_len inside a
    # zero-padded buffer viewed as [.., n_chunks, C] (C = M * P, a multiple
    # of 128); the stream phase S = Q - tail_len is absorbed into the weight
    # matrix, so NO misaligned copy of the full-rate signal ever happens.
    # Z = chunks @ chunk_w gives every (output-phase b, chunk-lag d) partial
    # with column order d*P + b, and y[P*a + b] = sum_d Z[a + d, d*P + b]
    # -- the combine is D contiguous P-lane slices (a lane-STRIDED slice here
    # cost ~100 ms/block on v5e). One MXU contraction with a full C-deep K
    # axis replaces the 1-output-channel conv (~300x under peak).
    chunk_c: int  # C (0 = form unavailable, fall back to the conv)
    chunk_d: int  # D = number of chunk lags
    chunk_q: int  # Q = aligned input offset (multiple of 128, >= tail_len)
    chunk_w: np.ndarray  # [C, D * (C//M)] f32


def _plan_chunk_matmul(m: int, r_rows: int, h_rev: np.ndarray, tail_len: int):
    """Pick chunk width C = M*P and build the [C, D*P] matrix.

    C must be a multiple of 128 (lane tiles) and of M (whole output phases
    per chunk). P is the largest power of two <= 128 that satisfies both with
    C <= 8192; FLOPs/input = 2*P*D, so P is kept at the smallest size that
    still holds D at its floor of 2 (D = ceil(max window extent / C)).
    """
    cands = []
    p = 128
    while p >= 8:
        c = m * p
        if c <= 8192 and c % 128 == 0:
            q = -(-tail_len // 128) * 128  # aligned input offset
            s = q - tail_len  # phase shift absorbed into the weights
            d = -(-(s + (p - 1) * m + r_rows * m) // c)
            d = max(d, 1 + -(-q // c))  # buffer must cover the offset: (D-1)*C >= Q
            cands.append((c, p, d, q, s))
        p //= 2
    # layout first (wide contiguous combine slices = large P), FLOPs second
    # (2*P*D per input sample): the largest P whose P*D fits the cap.
    best = None
    for cap in (128, 256, 512):
        fitting = [t for t in cands if t[1] * t[2] <= cap]
        if fitting:
            best = max(fitting, key=lambda t: t[1])
            break
    if best is None:
        return 0, 0, 0, np.zeros((0, 0), dtype=np.float32)
    c, p, d, q, s = best
    w_full = np.zeros((p, d * c))
    for b in range(p):
        w_full[b, s + b * m : s + b * m + r_rows * m] = h_rev
    # column order d*P + b: the combine slices z[..., d*P:(d+1)*P] contiguously
    w2 = w_full.reshape(p, d, c).transpose(2, 1, 0).reshape(c, d * p)
    return c, d, q, w2.astype(np.float32)


def plan_stage(interp: int, decim: int) -> StagePlan:
    taps = design_resampler_taps(interp, decim)
    ntaps = len(taps)
    tail_len = -(-(ntaps - 1) // interp)  # ceil
    pad = tail_len * interp - (ntaps - 1)
    kernel = np.concatenate([np.zeros(pad), taps[::-1]]).astype(np.float32)

    m = decim
    r_rows = -(-(ntaps - 1) // m) + 1
    h_rev = np.zeros(r_rows * m)
    h_rev[:ntaps] = taps[::-1]
    poly = np.zeros((1, m, r_rows), dtype=np.float32)
    for q in range(r_rows):
        for rr in range(m):
            poly[0, rr, q] = h_rev[q * m + rr]
    chunk_c, chunk_d, chunk_q, chunk_w = (
        _plan_chunk_matmul(m, r_rows, h_rev, tail_len)
        if interp == 1
        else (0, 0, 0, np.zeros((0, 0), np.float32))
    )
    return StagePlan(
        interp, decim, ntaps, tail_len, kernel, poly, r_rows, chunk_c, chunk_d, chunk_q, chunk_w
    )


def plan_chain(sample_rate: int, bandwidth: int, threshold: int = 125) -> List[StagePlan]:
    """Stage plans from sample_rate down to bandwidth (reference recorder.cpp:29-33)."""
    return [plan_stage(l, m) for l, m in get_resamplers_factors(sample_rate, bandwidth, threshold)]


def chain_block_multiple(plans: Sequence[StagePlan]) -> int:
    """Smallest block length (in input samples) that every stage consumes
    integrally, so streaming chunk lengths stay static-shaped."""
    need = 1
    num, den = 1, 1  # cumulative L/M as a fraction
    for p in plans:
        num *= p.interp
        den *= p.decim
        g = math.gcd(num, den)
        num //= g
        den //= g
        # block * num/den must be an integer at this point in the chain
        need = need * den // math.gcd(need, den)
    return need


def chain_output_length(plans: Sequence[StagePlan], n: int) -> int:
    for p in plans:
        assert (n * p.interp) % p.decim == 0, (n, p.interp, p.decim)
        n = n * p.interp // p.decim
    return n


class DdcState(NamedTuple):
    """Streaming carry for K recorder slots."""

    phase: jnp.ndarray  # [K] f32 NCO phase at block start (radians, mod 2pi)
    tails: Tuple[jnp.ndarray, ...]  # per stage [K, 2, tail_len] f32 (re/im)


def init_ddc_state(plans: Sequence[StagePlan], num_slots: int) -> DdcState:
    return DdcState(
        phase=jnp.zeros((num_slots,), dtype=jnp.float32),
        tails=tuple(
            jnp.zeros((num_slots, 2, p.tail_len), dtype=jnp.float32) for p in plans
        ),
    )


def reset_slot(state: DdcState, slot: int) -> DdcState:
    """Zero one slot's carry (recording start/stop; reference clears its chain
    by toggling the Blocker and clearing the buffer, recorder.cpp:58-87)."""
    return DdcState(
        phase=state.phase.at[slot].set(0.0),
        tails=tuple(t.at[slot].set(0.0) for t in state.tails),
    )


# ---------------------------------------------------------------------------
# NCO tables (host-side exact math)
# ---------------------------------------------------------------------------


class NcoTables(NamedTuple):
    """Per-slot rotation tables in complex (cos, sin) form.

    angle(n) = coarse[n // Q] + fine[n % Q] (exact int64 modular host math),
    applied as e^{i angle} = coarse_c * fine_c -- a complex MULTIPLY of two
    unit-magnitude table entries instead of per-sample cos/sin (transcendental
    throughput, not bandwidth, bounded the rotation on v5e). f32 error per
    product ~1e-7, far inside the int8 recording tolerance."""

    coarse_re: jnp.ndarray  # [K, chunk//Q] f32 = cos(coarse angle)
    coarse_im: jnp.ndarray  # [K, chunk//Q] f32 = sin(coarse angle)
    fine_re: jnp.ndarray  # [K, Q] f32
    fine_im: jnp.ndarray  # [K, Q] f32
    step: jnp.ndarray  # [K] f32: (phase_inc * chunk) mod 2pi


NCO_Q = 8192


def _nco_q(chunk: int) -> int:
    """Largest power-of-two divisor of chunk, capped at NCO_Q."""
    q = 1
    while q < NCO_Q and chunk % (q * 2) == 0:
        q *= 2
    return q


def make_nco_tables(shifts: np.ndarray, sample_rate: int, chunk: int) -> NcoTables:
    """Exact NCO angle tables for per-slot shifts.

    phase_inc = 2*pi*(-shift)/sample_rate (reference recorder.cpp:64);
    angle(n) = phase_inc*n mod 2pi computed with int64 modular arithmetic.
    """
    qsize = _nco_q(chunk)
    shifts = np.asarray(shifts, dtype=np.int64)
    smod = (-shifts) % sample_rate  # [K]
    two_pi_over_rate = 2.0 * np.pi / sample_rate

    r = np.arange(qsize, dtype=np.int64)
    fine = ((smod[:, None] * r[None, :]) % sample_rate) * two_pi_over_rate

    q = np.arange(chunk // qsize, dtype=np.int64) * qsize
    coarse = ((smod[:, None] * q[None, :]) % sample_rate) * two_pi_over_rate

    step = ((smod * chunk) % sample_rate) * two_pi_over_rate
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return NcoTables(
        coarse_re=f32(np.cos(coarse)),
        coarse_im=f32(np.sin(coarse)),
        fine_re=f32(np.cos(fine)),
        fine_im=f32(np.sin(fine)),
        step=f32(step),
    )


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def _stage_apply(
    x: jnp.ndarray, tail: jnp.ndarray, plan: StagePlan
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One resampler stage on [K, 2, n] f32 -> [K, 2, n*L//M]; carries tail.

    Causal zero-stuffed FIR: y[m] = sum_j h[j] * up(x)[m*M - j]. Decimation
    stages (L==1, the common case) run in the chunked-matmul form: the input
    is viewed as lane-aligned chunks of C samples (C a multiple of
    lcm(M, 128)), one [.., C] @ [C, P*D] MXU contraction produces every
    (output-phase, chunk-lag) partial sum, and the diagonal combine
    y[P*a+b] = sum_d Z[a+d, b*D+d] is D static strided slices. Interpolating
    stages use the dilated/strided conv form.
    """
    k, two, n = x.shape
    full = jnp.concatenate([tail, x], axis=-1)
    new_tail = full[..., -plan.tail_len :]
    out_len = n * plan.interp // plan.decim

    if plan.interp == 1 and plan.chunk_c > 0:
        m = plan.decim
        c, d, q = plan.chunk_c, plan.chunk_d, plan.chunk_q
        p = c // m
        a_tiles = -(-out_len // p)  # ceil: output rounded up to whole chunks
        n_chunks = a_tiles + d - 1
        # lhs layout: [zeros(Q - tail_len), tail, x, zeros(post)] -- x lands at
        # the 128-aligned offset Q, so the only misaligned write is the tiny
        # tail; the stream phase S = Q - tail_len lives in chunk_w.
        lhs = jnp.concatenate(
            [
                jnp.zeros((k, two, q - plan.tail_len), x.dtype),
                tail,
                x,
                jnp.zeros((k, two, n_chunks * c - q - n), x.dtype),
            ],
            axis=-1,
        ).reshape(k * two, n_chunks, c)
        z = jax.lax.dot_general(
            lhs,
            jnp.asarray(plan.chunk_w),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K2, n_chunks, D*P], column order d*P + b
        acc = z[:, 0:a_tiles, 0:p]
        for dd in range(1, d):
            acc = acc + z[:, dd : dd + a_tiles, dd * p : (dd + 1) * p]
        out = acc.reshape(k * two, a_tiles * p)[:, :out_len]
        return out.reshape(k, two, out_len), new_tail

    if plan.interp == 1:
        m, r_rows = plan.decim, plan.poly_rows
        need = (out_len + r_rows - 1) * m
        lhs = full.reshape(k * two, -1)
        lhs = jnp.pad(lhs, ((0, 0), (0, need - lhs.shape[-1])))
        rows = lhs.reshape(k * two, -1, m)  # [K2, rows, M]
        lhs_c = jnp.moveaxis(rows, 1, 2)  # [K2, M, rows]
        out = jax.lax.conv_general_dilated(
            lhs_c,
            jnp.asarray(plan.poly_kernel),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
        )
        return out[:, 0, :out_len].reshape(k, two, out_len), new_tail

    lhs = full.reshape(k * two, 1, n + plan.tail_len)
    rhs = jnp.asarray(plan.kernel).reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(plan.decim,),
        padding=[(0, max(0, plan.interp - plan.decim))],
        lhs_dilation=(plan.interp,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return out.reshape(k, two, out_len), new_tail


def ddc_chunk(
    iq: jnp.ndarray,
    state: DdcState,
    tables: NcoTables,
    plans: Sequence[StagePlan],
) -> Tuple[DdcState, jnp.ndarray]:
    """Process one chunk of IQ through K rotator+resampler slots.

    iq: [chunk] complex64, or [chunk, 2] int8 cs8 / f32 pairs (combined here,
        fused with the rotation -- no full-rate complex64 HBM round trip); the
        shared full-rate source feeds all slots, as in the reference where
        every recorder chain taps the same SdrSource.
    returns int8 interleaved output [K, out_len, 2].
    """
    chunk = iq.shape[0]
    k = state.phase.shape[0]

    # rot = e^{i phase} * coarse_c * fine_c: two complex multiplies from unit
    # tables; only the K block-start phases need cos/sin
    ph_re = jnp.cos(state.phase)[:, None]
    ph_im = jnp.sin(state.phase)[:, None]
    c_re = ph_re * tables.coarse_re - ph_im * tables.coarse_im  # [K, nq]
    c_im = ph_re * tables.coarse_im + ph_im * tables.coarse_re
    rot_re = (
        c_re[:, :, None] * tables.fine_re[:, None, :]
        - c_im[:, :, None] * tables.fine_im[:, None, :]
    ).reshape(k, chunk)
    rot_im = (
        c_re[:, :, None] * tables.fine_im[:, None, :]
        + c_im[:, :, None] * tables.fine_re[:, None, :]
    ).reshape(k, chunk)
    if iq.dtype == jnp.int8:
        x_re = (iq[:, 0].astype(jnp.float32) * (1.0 / 127.5))[None, :]
        x_im = (iq[:, 1].astype(jnp.float32) * (1.0 / 127.5))[None, :]
    elif iq.ndim == 2:  # f32 (re, im) pairs
        x_re = iq[:, 0][None, :]
        x_im = iq[:, 1][None, :]
    else:
        x_re = jnp.real(iq)[None, :]
        x_im = jnp.imag(iq)[None, :]
    # (x_re + i x_im) * (cos + i sin)
    y = jnp.stack(
        [x_re * rot_re - x_im * rot_im, x_re * rot_im + x_im * rot_re], axis=1
    )  # [K, 2, chunk] f32

    new_tails = []
    for plan, tail in zip(plans, state.tails):
        y, new_tail = _stage_apply(y, tail, plan)
        new_tails.append(new_tail)

    out = jnp.clip(jnp.round(jnp.moveaxis(y, 1, 2) * 127.0), -128, 127).astype(jnp.int8)
    new_phase = jnp.mod(state.phase + tables.step, 2.0 * jnp.pi)
    return DdcState(phase=new_phase, tails=tuple(new_tails)), out


def ddc_chunk_banded(
    iq: jnp.ndarray,
    state: DdcState,
    tables: NcoTables,
    plans: Sequence[StagePlan],
    n_bands: int,
    use_pallas_fir: bool = False,
) -> Tuple[DdcState, jnp.ndarray]:
    """ddc_chunk over ALL bands in one call (no vmap): iq [NB, chunk(,2)],
    state/tables pre-folded to leading dim NB*K.

    Folding bands into the batch row dimension lets the resampler stages run
    as ONE kernel over [NB*K*2, n] rows -- required by the Pallas FIR kernel
    (ops/pallas/fir_kernel.py), and one conv instead of NB for the XLA form.
    """
    nb, chunk = iq.shape[0], iq.shape[1]
    k_total = state.phase.shape[0]
    k = k_total // nb

    ph_re = jnp.cos(state.phase).reshape(nb, k, 1)
    ph_im = jnp.sin(state.phase).reshape(nb, k, 1)
    c_re = ph_re * tables.coarse_re.reshape(nb, k, -1) - ph_im * tables.coarse_im.reshape(nb, k, -1)
    c_im = ph_re * tables.coarse_im.reshape(nb, k, -1) + ph_im * tables.coarse_re.reshape(nb, k, -1)
    f_re = tables.fine_re.reshape(nb, k, 1, -1)
    f_im = tables.fine_im.reshape(nb, k, 1, -1)
    rot_re = (c_re[..., None] * f_re - c_im[..., None] * f_im).reshape(nb, k, chunk)
    rot_im = (c_re[..., None] * f_im + c_im[..., None] * f_re).reshape(nb, k, chunk)
    if iq.dtype == jnp.int8:
        x_re = (iq[..., 0].astype(jnp.float32) * (1.0 / 127.5))[:, None, :]
        x_im = (iq[..., 1].astype(jnp.float32) * (1.0 / 127.5))[:, None, :]
    elif iq.ndim == 3:  # f32 (re, im) pairs
        x_re = iq[..., 0][:, None, :]
        x_im = iq[..., 1][:, None, :]
    else:
        x_re = jnp.real(iq)[:, None, :]
        x_im = jnp.imag(iq)[:, None, :]
    y = jnp.stack(
        [x_re * rot_re - x_im * rot_im, x_re * rot_im + x_im * rot_re], axis=2
    ).reshape(nb * k, 2, chunk)

    new_tails = []
    for plan, tail in zip(plans, state.tails):
        if use_pallas_fir:
            from rtl_sdr_scanner_tpu.ops.pallas.fir_kernel import stage_apply_pallas

            y, new_tail = stage_apply_pallas(y, tail, plan)
        else:
            y, new_tail = _stage_apply(y, tail, plan)
        new_tails.append(new_tail)

    out = jnp.clip(jnp.round(jnp.moveaxis(y, 1, 2) * 127.0), -128, 127).astype(jnp.int8)
    new_phase = jnp.mod(state.phase + tables.step, 2.0 * jnp.pi)
    out = out.reshape(nb, k, -1, 2)
    return DdcState(phase=new_phase, tails=tuple(new_tails)), out


# ---------------------------------------------------------------------------
# Modulated-taps DDC (v2): rotation folded into the first decimation stage
# ---------------------------------------------------------------------------
#
# The v1 path materializes the ROTATED full-rate stream per slot
# ([K, 2, chunk] f32) plus the rotation-table outer product ([K, chunk] x2),
# ~16 GB of HBM traffic per 32-band block -- the dominant DDC cost on v5e.
# The classic DDC identity removes it:
#
#   y1[m] = sum_j h[j] x[mM-j] e^{i(phi0 + inc(mM-j))}
#         = e^{i(phi0 + inc M m)} sum_j (h[j] e^{-i inc j}) x[mM-j]
#
# so stage 1 filters the RAW input with complex modulated taps
# g[j] = h[j] e^{-i inc j} (per slot, host-exact int64 angles), and the NCO
# rotation happens at the DECIMATED rate (M x fewer samples). The raw-x
# overlap-save tail is shared by all slots. Same chunked-matmul MXU form;
# 2x the stage-1 FLOPs (complex x complex), ~4x less stage-1 HBM traffic.
#
# Semantics note: a freshly reset slot keeps the shared raw-x history for
# stage 1 (its stage-2+ tails and phase are zeroed), so a new recording has
# no zero-history startup transient -- a deliberate, strictly-better
# divergence from the reference's freshly-built chain (recorder.cpp:21-40);
# the first ceil(ntaps/M) output samples differ from v1 after a mid-stream
# reset only.


class Ddc2State(NamedTuple):
    """Streaming carry for the modulated-taps path."""

    phase: jnp.ndarray  # [K] (or [NB, K]) f32 NCO phase at block start
    x_tail: jnp.ndarray  # [2, tail0] (or [NB, 2, tail0]) raw-x overlap-save
    tails: Tuple[jnp.ndarray, ...]  # stages 2+: [K, 2, t] (or [NB, K, 2, t])


class ModTables(NamedTuple):
    """Per-retune stage-1 modulated weights + decimated-rate NCO tables."""

    w: jnp.ndarray  # [C, K*2*D*P] f32, column order (k, part, d*P + b)
    rot: "NcoTables"  # decimated-rate output rotation (angles at n = M*m)


def init_ddc2_state(plans: Sequence[StagePlan], num_slots: int) -> Ddc2State:
    return Ddc2State(
        phase=jnp.zeros((num_slots,), dtype=jnp.float32),
        x_tail=jnp.zeros((2, plans[0].tail_len), dtype=jnp.float32),
        tails=tuple(
            jnp.zeros((num_slots, 2, p.tail_len), dtype=jnp.float32)
            for p in plans[1:]
        ),
    )


def reset_slot2(state: Ddc2State, slot: int) -> Ddc2State:
    """Zero one slot's carry; the shared raw-x stage-1 tail stays (see the
    semantics note above)."""
    return Ddc2State(
        phase=state.phase.at[slot].set(0.0),
        x_tail=state.x_tail,
        tails=tuple(t.at[slot].set(0.0) for t in state.tails),
    )


@functools.lru_cache(maxsize=16)
def _modtap_scatter_index(m: int, r_rows: int, tail_len: int, c: int, d: int, q: int):
    """Static gather index building w_full[b, col] = g_rev[col - s - b*m]
    (sentinel slot r_rows*m for out-of-range), plus the final permutation
    already applied: returns idx [C, D*P] s.t. w[:, k2, dp] = g_pad[idx].

    Returned as NUMPY (not jnp), like detect._vote_select_onehot: a cached
    DEVICE array closed over by a jit traces as a constant whose value must
    be fetched device->host at trace time -- which deadlocks/errors on the
    axon tunnel when it is the process's first device interaction."""
    p = c // m
    s = q - tail_len
    cols = np.arange(d * c)
    rows = np.arange(p)[:, None]
    t = cols[None, :] - s - rows * m
    sentinel = r_rows * m
    t = np.where((t >= 0) & (t < r_rows * m), t, sentinel)
    # [P, D*C] -> same permutation as _plan_chunk_matmul: reshape(p, d, c)
    # .transpose(2, 1, 0).reshape(c, d*p)
    idx = t.reshape(p, d, c).transpose(2, 1, 0).reshape(c, d * p)
    return idx.astype(np.int32)


def make_mod_tables(
    plans: Sequence[StagePlan], shifts: np.ndarray, sample_rate: int, chunk: int
) -> ModTables:
    """Host-exact modulated-tap tables for per-slot shifts.

    Tap angles and the decimated-rate rotation both come from int64 modular
    arithmetic (same guarantees as make_nco_tables). The big weight matrix is
    assembled ON DEVICE from the tiny [K, 2, R*M] modulated-tap vectors."""
    p0 = plans[0]
    assert p0.interp == 1 and p0.chunk_c > 0, "modtap needs a chunked stage 1"
    m = p0.decim
    shifts = np.asarray(shifts, dtype=np.int64)
    smod = (-shifts) % sample_rate  # [K]
    ntaps = p0.ntaps
    rm = p0.poly_rows * m

    # g_rev[t] = h_rev[t] * e^{-i inc (ntaps-1-t)}, h_rev already reversed
    h_rev = np.zeros(rm)
    h_rev[:ntaps] = np.asarray(design_resampler_taps(p0.interp, p0.decim))[::-1]
    j = np.maximum(ntaps - 1 - np.arange(rm), 0)  # forward tap index
    ang = ((smod[:, None] * j[None, :]) % sample_rate) * (2.0 * np.pi / sample_rate)
    g = np.stack(
        [h_rev[None, :] * np.cos(ang), -h_rev[None, :] * np.sin(ang)], axis=1
    )  # [K, 2, RM]
    g_pad = np.concatenate([g, np.zeros((g.shape[0], 2, 1))], axis=-1).astype(
        np.float32
    )

    idx = _modtap_scatter_index(m, p0.poly_rows, p0.tail_len, p0.chunk_c, p0.chunk_d, p0.chunk_q)

    @jax.jit
    def build(gp):
        # [K, 2, C, D*P] -> [C, K*2*D*P]
        w = gp[:, :, idx]
        k = gp.shape[0]
        return jnp.moveaxis(w, 2, 0).reshape(p0.chunk_c, k * 2 * idx.shape[1])

    rot = make_nco_tables(-((smod * m) % sample_rate), sample_rate, chunk // m)
    return ModTables(w=build(jnp.asarray(g_pad)), rot=rot)


def _modtap_stage1(
    x: jnp.ndarray,  # [NB, 2, chunk] f32 raw components
    x_tail: jnp.ndarray,  # [NB, 2, tail0]
    w: jnp.ndarray,  # [NB, C, K*2*D*P]
    plan: StagePlan,
    k: int,
    bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Complex-tap chunked-matmul stage 1 over the raw input.

    Returns (y_re, y_im) [NB, K, out1] and the new raw tail.

    bf16=True runs the contraction with bf16 OPERANDS (f32 accumulation) --
    a measurement/tolerance switch (scripts/profile_modtap.py), not the
    production default."""
    nb, two, n = x.shape
    m = plan.decim
    c, d, q = plan.chunk_c, plan.chunk_d, plan.chunk_q
    p = c // m
    out_len = n // m
    a_tiles = -(-out_len // p)
    n_chunks = a_tiles + d - 1
    lhs = jnp.concatenate(
        [
            jnp.zeros((nb, two, q - plan.tail_len), x.dtype),
            x_tail,
            x,
            jnp.zeros((nb, two, n_chunks * c - q - n), x.dtype),
        ],
        axis=-1,
    ).reshape(nb, two * n_chunks, c)
    if bf16:
        lhs = lhs.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
    z = jax.lax.dot_general(
        lhs,
        w,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(nb, two, n_chunks, k, 2, d * p)
    acc = z[:, :, 0:a_tiles, :, :, 0:p]
    for dd in range(1, d):
        acc = acc + z[:, :, dd : dd + a_tiles, :, :, dd * p : (dd + 1) * p]
    # acc [NB, xcomp, a, K, gcomp, P] -> [NB, xcomp, K, gcomp, out1]
    acc = jnp.moveaxis(acc, 2, 4).reshape(nb, two, k, 2, a_tiles * p)[..., :out_len]
    y_re = acc[:, 0, :, 0] - acc[:, 1, :, 1]
    y_im = acc[:, 0, :, 1] + acc[:, 1, :, 0]
    new_tail = jnp.concatenate([x_tail, x], axis=-1)[..., -plan.tail_len :]
    return y_re, y_im, new_tail


def ddc_chunk_modtap(
    iq: jnp.ndarray,  # [NB, chunk(,2)] int8 cs8 / f32 pairs / c64
    state: Ddc2State,  # banded leaves: phase [NB,K], x_tail [NB,2,t0], tails [NB,K,2,t]
    tables: ModTables,  # banded leaves: w [NB,C,K2DP], rot fields [NB,K,...]
    plans: Sequence[StagePlan],
) -> Tuple[Ddc2State, jnp.ndarray]:
    """Modulated-taps DDC chunk over all bands; returns int8 [NB, K, out, 2]."""
    nb, chunk = iq.shape[0], iq.shape[1]
    k = state.phase.shape[-1]
    p0 = plans[0]
    out1 = chunk // p0.decim

    if iq.dtype == jnp.int8:
        x = jnp.moveaxis(iq.astype(jnp.float32) * (1.0 / 127.5), -1, 1)
    elif iq.ndim == 3:
        x = jnp.moveaxis(iq, -1, 1)  # [NB, 2, chunk]
    else:
        x = jnp.stack([jnp.real(iq), jnp.imag(iq)], axis=1)

    y_re, y_im, new_x_tail = _modtap_stage1(x, state.x_tail, tables.w, p0, k)

    # decimated-rate output rotation: e^{i(phi0 + inc M m)}
    rt = tables.rot
    ph_re = jnp.cos(state.phase)[..., None]  # [NB, K, 1]
    ph_im = jnp.sin(state.phase)[..., None]
    c_re = ph_re * rt.coarse_re - ph_im * rt.coarse_im  # [NB, K, nq]
    c_im = ph_re * rt.coarse_im + ph_im * rt.coarse_re
    rot_re = (
        c_re[..., None] * rt.fine_re[..., None, :] - c_im[..., None] * rt.fine_im[..., None, :]
    ).reshape(nb, k, out1)
    rot_im = (
        c_re[..., None] * rt.fine_im[..., None, :] + c_im[..., None] * rt.fine_re[..., None, :]
    ).reshape(nb, k, out1)
    y = jnp.stack(
        [y_re * rot_re - y_im * rot_im, y_re * rot_im + y_im * rot_re], axis=2
    ).reshape(nb * k, 2, out1)

    new_tails = []
    for plan, tail in zip(plans[1:], state.tails):
        y, new_tail = _stage_apply(y, tail.reshape(nb * k, 2, -1), plan)
        new_tails.append(new_tail.reshape(nb, k, 2, -1))

    out = jnp.clip(jnp.round(jnp.moveaxis(y, 1, 2) * 127.0), -128, 127).astype(jnp.int8)
    new_phase = jnp.mod(state.phase + rt.step, 2.0 * jnp.pi)
    return (
        Ddc2State(phase=new_phase, x_tail=new_x_tail, tails=tuple(new_tails)),
        out.reshape(nb, k, -1, 2),
    )


def make_ddc_step(plans: Sequence[StagePlan], num_chunks: int):
    """Jittable block processor: scan ddc_chunk over num_chunks chunks.

    iq_block: [num_chunks, chunk] complex64 -> out [num_chunks, K, out_len, 2].
    Chunked lax.scan bounds the [K, chunk] rotation working set in HBM.
    """

    def step(state: DdcState, iq_block: jnp.ndarray, tables: NcoTables):
        def body(carry, chunk_iq):
            new_state, out = ddc_chunk(chunk_iq, carry, tables, plans)
            return new_state, out

        state, outs = jax.lax.scan(body, state, iq_block)
        return state, outs

    return step
