"""Device-side detection compaction.

The reference detector consumes full power rows on the CPU (transmission.cpp).
A TPU deployment cannot afford shipping full fft-size rows to the host every
frame (device->host bandwidth), so the detection-relevant information is
compacted ON DEVICE to a few KB per block:

- top-K candidate bins of the smoothed row (masked to in-range & not-ignored),
  with the exact count above start level (overflow detection);
- the reference's history vote (Transmission::getBestIndex,
  transmission.cpp:132-154) computed on device per candidate: windowed argmax
  over the newest half of the raw-row ring, mode with the C++ median-of-ties
  rule (collection_utils.h:29-50);
- per-tracked-key windowed argmax of the smoothed row
  (Transmission::updateSignals, transmission.cpp:113-130) for host-provided
  key slots.

The host tracker consumes these in compact mode
(runtime/transmission_tracker.py process_compact); full-row mode remains the
bit-exact parity reference. Semantics match except two bounded cases:
candidate overflow (> K bins above level in one frame; host logs) and signals
added mid-block (updates approximated from candidates until the next block,
so a mid-block-added signal that immediately fades below start level can miss
sub-start-level last-activity refreshes for the remainder of that block).
Isolated signals match frame-exactly (tests/test_detect_compact.py); signal
CLUSTERS overlapping within the dedup margin can shift add/timeout timing by
up to one block, while remaining behaviorally equivalent (same bands tracked
over the same activity spans -- randomized stress test).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _two_stage_top_k(rows: jnp.ndarray, k: int):
    """Exact top-k over the last axis via segment-wise reduction.

    A single lax.top_k over a 131072-wide row lowers to a full sort on TPU
    (~0.8 ms/row -- it dominated the scan step). Splitting into ~1024-wide
    segments, taking top-k per segment (global top-k is a subset of the
    per-segment top-k union), then top-k over the survivors is ~20x cheaper
    and yields IDENTICAL values/indices incl. first-index tie order (segment
    concatenation preserves index order).
    """
    *lead, n = rows.shape
    seg_width = 1024
    while seg_width < k:  # segments must each be able to hold k winners
        seg_width *= 2
    if n <= seg_width or n % seg_width != 0:
        vals, idxs = jax.lax.top_k(rows, k)
        return vals, idxs
    s = n // seg_width
    seg = rows.reshape(*lead, s, seg_width)
    v1, i1 = jax.lax.top_k(seg, k)  # [..., s, k]
    offs = (jnp.arange(s, dtype=jnp.int32) * seg_width)[:, None]
    flat_v = v1.reshape(*lead, s * k)
    flat_i = (i1 + offs).reshape(*lead, s * k)
    vals, j = jax.lax.top_k(flat_v, k)
    idxs = jnp.take_along_axis(flat_i, j, axis=-1)
    return vals, idxs


POOL = 8  # max-pool cell width for the pooled top-k prefilter


def _pooled_top_k(rows: jnp.ndarray, k: int, pool: int = POOL):
    """Exact top-k (values, indices, first-index ties) via a max-pool prefilter.

    The top-k POOLED CELLS (by max value) are a guaranteed superset of the
    cells holding the true top-k bins: if bin b ranked k-th were missed, the
    >= k cells ahead of b's cell each contain a distinct bin that outranks b
    -- strictly greater value, or equal value in an earlier cell, whose bins
    ALL have smaller indices because cell order IS index order -- so b could
    not be in the exact top-k. Sorting the winning cells back to index order
    and re-running top-k over their gathered bins therefore reproduces
    _two_stage_top_k (the replaced production path) bit-exactly, with the
    DOCUMENTED lax.top_k first-occurrence tie rule, while the expensive
    per-segment sort runs at 1/pool width. (Raw lax.top_k itself is
    tie-unstable at some widths on current XLA builds -- e.g. scrambled tie
    indices at n=8192, stable at n=131072 -- so equality with raw lax.top_k
    is geometry-dependent; tests pin pooled == two-stage everywhere and
    pooled == lax.top_k at the production fft.)

    Measured on v5e (32 bands x 20 frames x fft 131072): 46.9 ms vs 54.6 for
    the two-stage form (scripts/profile_detect.py) -- the one-pass max-pool
    relayout costs less than the 8x narrower sort saves. (The same pooling
    applied PER ITERATION inside _margin_separated_top loses 2.4x; see its
    docstring.)
    """
    *lead, n = rows.shape
    if n % pool != 0 or n // pool < 4 * k:
        return _two_stage_top_k(rows, k)
    np_cells = n // pool
    pooled = jnp.max(rows.reshape(*lead, np_cells, pool), axis=-1)
    # RECURSE on the pooled cells: the superset lemma composes level by
    # level (supercell order = cell order = index order), so each level of
    # pooling runs the expensive per-segment sorts at 1/pool the width.
    # At fft 131072 this turns 16 top_k-sorts of 1024 into pooling reduces
    # + 2 such sorts (round-4: selection measured latency-bound on sort
    # count, not HBM -- 8 passes of row reads are ~7 ms of bandwidth but
    # the stage cost 69 ms).
    _, cell_idx = _pooled_top_k(pooled, k, pool)  # [..., k] value-sorted
    cell_idx = jnp.sort(cell_idx, axis=-1)  # back to index order for tie rule
    bin_idx = (
        cell_idx[..., :, None] * pool + jnp.arange(pool, dtype=jnp.int32)
    ).reshape(*lead, k * pool)
    cand = jnp.take_along_axis(rows, bin_idx, axis=-1)  # [..., k*pool]
    vals, j = jax.lax.top_k(cand, k)
    idxs = jnp.take_along_axis(bin_idx, j, axis=-1)
    return vals, idxs


class CompactOutputs(NamedTuple):
    # candidates = plain top-K bins UNION greedy margin-separated top bins
    # (strongest per +-submargin cluster). The union guarantees that dense
    # clusters (many bins above level around few signals) cannot crowd a
    # weaker distinct signal out of the candidate list; losing a signal now
    # requires more DISTINCT signals than K_SEP in one frame.
    cand_idx: jnp.ndarray  # [F, K + K_SEP] i32 candidate bins, value-sorted desc
    cand_val: jnp.ndarray  # [F, K + K_SEP] f32 smoothed power at candidate
    cand_best: jnp.ndarray  # [F, K + K_SEP] i32 history-vote result per candidate
    cand_count: jnp.ndarray  # [F] i32 number of bins >= start_level (masked)
    key_val: jnp.ndarray  # [F, S] f32 windowed max of avg around each key
    key_idx: jnp.ndarray  # [F, S] i32 argmax position for key_val


K_SEP = 16  # margin-separated candidate slots

# History-vote implementation: "gather" = candidate-window block gathers
# (_vote_windows_gather, computes only the consumed cells), "code" = the
# round-4 int8-code sliding table (sliding_argmax_code + _vote_windows_code;
# falls back to the f32+i32 pair tables for windows wider than 128 bins).
# Trace-time constant: flip before building a jitted step to A/B
# (scripts/profile_detect.py).
VOTE_FORM = "code"
# lowering of the gather inside _vote_windows_gather: "slice" =
# vmap(dynamic_slice) (concatenated-slice lowering), "index" = one gather op
# over expanded row indices. Both bit-exact; kept switchable because the
# slice lowering FAULTED the TPU worker inside the full fused program
# (round-5 negative result) while running fine isolated.
VOTE_GATHER_LOWERING = "slice"


# margin-sweep winners extracted per full-row pass. K_SEP winners in ONE
# pass measured best on v5e (32.7 / 47.8 / 40.3 / 62.3 ms median for
# 16/4/8/2 per pass at 32 bands x F=45 bf16): every extra full-row pass
# re-reads and re-reduces all [F, S, W] rows, while a per-winner patch
# only re-reduces the <= 2 segments its zone touched.
WINNERS_PER_PASS = 16


def _margin_separated_top(
    rows: jnp.ndarray, k: int, submargin: int, per_pass: int = 0
):
    """Greedy strongest-first selection with +-submargin suppression.

    Returns the top bin of each of the k strongest margin-separated clusters
    (the reference's add loop can insert at most one signal per margin window,
    contains_with_margin collection_utils.h:16-27).

    Production form: W winners per full-row pass (k/W passes; W=k -> ONE
    pass). Each pass computes per-1024-segment (max, first-argmax); winner 1
    is exact from the segment table (first segment holding the max +
    in-segment first argmax = global first-occurrence argmax). Its
    +-submargin zone touches at most 2 segments, which are re-reduced from a
    gathered copy with every IN-PASS zone so far masked (a zone can overlap
    a later winner's segments before the carried mask sees it), and the
    table is patched; each later winner is then exact from the patched table
    -- identical to the sequential greedy. Suppression across passes is a
    carried BOOL mask (1 byte/bin) applied on the fly, so rows are never
    rewritten. All-16-in-one-pass measured best on v5e (median 32.7 ms vs
    62.3 for 2/pass at 32 bands x F=45 bf16): the sweep is pass-count-bound,
    not bandwidth-bound, and a per-winner patch re-reduces only <= 2
    segments while an extra pass re-reduces all of them.

    Negative results kept for the record: (a) masked-f32-carry wrote
    335 MB/iteration; (b) per-segment top-m supersets fail on all-tied
    sentinel rows; (c) max-pool-8 + in-cell-refine argmax per iteration
    relayouts the minor axis every iteration and measured 140 ms vs 59;
    (d) the one-winner-per-pass form (k full-row argmax sweeps) is the
    fallback below for geometries the segment form does not fit;
    (e) a VMEM-resident Pallas kernel iterating 80 winners lost 2.4x to
    per-iteration issue latency (ops/pallas/select_kernel.py).
    """
    per_pass = per_pass or WINNERS_PER_PASS
    f, fft = rows.shape
    seg_w = 1024
    s = fft // seg_w
    while per_pass > 1 and k % per_pass != 0:
        per_pass //= 2
    if fft % seg_w != 0 or s < 2 or 2 * submargin + 1 > seg_w or per_pass < 2:
        return _margin_separated_top_1per(rows, k, submargin)

    bins = jnp.arange(fft, dtype=jnp.int32)[None, :]
    lane = jnp.arange(seg_w, dtype=jnp.int32)
    seg_ids = jnp.arange(s, dtype=jnp.int32)
    neg = jnp.asarray(-3.3e38, rows.dtype)  # keeps bf16 rows in bf16
    rows3 = rows.reshape(f, s, seg_w)

    def body(supp, _):
        cur3 = jnp.where(supp.reshape(f, s, seg_w), neg, rows3)
        pv = jnp.max(cur3, axis=-1)  # [F, S] patched value table
        pa = jnp.argmax(cur3, axis=-1).astype(jnp.int32)  # [F, S]
        vals = []
        idxs = []
        for j in range(per_pass):
            sj = jnp.argmax(pv, axis=-1).astype(jnp.int32)  # [F]
            vj = jnp.take_along_axis(pv, sj[:, None], axis=-1)[:, 0]
            ij = sj * seg_w + jnp.take_along_axis(pa, sj[:, None], axis=-1)[:, 0]
            vals.append(vj)
            idxs.append(ij)
            if j == per_pass - 1:
                break  # last winner of the pass: no patch needed
            # zone(wj) spans <= 2 segments; re-reduce them with the carried
            # mask AND every zone found in this pass so far
            t0 = jnp.clip((ij - submargin) // seg_w, 0, s - 1)
            t1 = jnp.clip((ij + submargin) // seg_w, 0, s - 1)
            touched = jnp.stack([t0, t1], axis=1)  # [F, 2]
            seg_rows = jnp.take_along_axis(rows3, touched[:, :, None], axis=1)
            seg_supp = jnp.take_along_axis(
                supp.reshape(f, s, seg_w), touched[:, :, None], axis=1
            )
            abs_bins = touched[:, :, None] * seg_w + lane  # [F, 2, seg_w]
            in_zone = seg_supp
            for w_idx in idxs:
                in_zone = in_zone | (
                    jnp.abs(abs_bins - w_idx[:, None, None]) <= submargin
                )
            masked = jnp.where(in_zone, neg, seg_rows)
            r_v = jnp.max(masked, axis=-1)  # [F, 2]
            r_a = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            for t in (0, 1):  # t0 == t1 patches twice with identical values
                m = seg_ids[None, :] == touched[:, t][:, None]
                pv = jnp.where(m, r_v[:, t][:, None], pv)
                pa = jnp.where(m, r_a[:, t][:, None], pa)
        for w_idx in idxs:
            supp = supp | (jnp.abs(bins - w_idx[:, None]) <= submargin)
        return supp, tuple(vals) + tuple(idxs)

    _, outs = jax.lax.scan(
        body, jnp.zeros(rows.shape, dtype=bool), None, length=k // per_pass
    )
    # interleave back to greedy order: w0(pass0), w1(pass0), ..., w0(pass1)
    vals = jnp.stack(outs[:per_pass], axis=1).reshape(k, f)
    idxs = jnp.stack(outs[per_pass:], axis=1).reshape(k, f)
    return vals.T, idxs.T  # [F, k]


def _margin_separated_top_1per(rows: jnp.ndarray, k: int, submargin: int):
    """One-winner-per-pass fallback: k read-only argmax sweeps."""
    f, fft = rows.shape
    bins = jnp.arange(fft, dtype=jnp.int32)[None, :]
    neg = jnp.asarray(-3.3e38, rows.dtype)

    def body(carry, _):
        supp = carry  # [F, fft] bool
        cur = jnp.where(supp, neg, rows)
        idx = jnp.argmax(cur, axis=-1).astype(jnp.int32)  # [F]
        val = jnp.take_along_axis(cur, idx[:, None], axis=-1)[:, 0]
        supp = supp | (jnp.abs(bins - idx[:, None]) <= submargin)
        return supp, (val, idx)

    _, (vals, idxs) = jax.lax.scan(
        body, jnp.zeros(rows.shape, dtype=bool), None, length=k
    )
    return vals.T, idxs.T  # [F, k]


def _sliding_span_tables(rows: jnp.ndarray, half: int, max_levels: int):
    """Shared doubling-table core of the sliding-window argmax family.

    Builds per-position (max value, int8 argmax-offset) tables over 2^J-wide
    spans via pure shifted slices; returns (v, off8, span, w) in PADDED
    coordinates (real bin b sits at position b + half; -inf padding on both
    edges shrinks edge windows like the host get_max_index).
    """
    *lead, n = rows.shape
    w = 2 * half + 1
    j_max = 0
    while (1 << (j_max + 1)) <= w and j_max + 1 <= max_levels:
        j_max += 1
    span = 1 << j_max  # span actually built, <= largest pow2 <= w
    assert span <= 128, "int8 offset encoding bounds the window span at 128"
    neg = -jnp.inf
    # padded coords: real bin b at position b + half; lookups reach
    # (n-1) + (w - span) + span - 1 = n + w - 2
    total = n + 2 * half + span
    pad_cfg = [(0, 0)] * len(lead)
    if rows.dtype not in (jnp.float32, jnp.bfloat16):
        rows = rows.astype(jnp.float32)  # bf16 stays bf16 (tolerance mode)
    v = jnp.pad(rows, pad_cfg + [(half, total - n - half)], constant_values=neg)
    off8 = jnp.zeros(v.shape, dtype=jnp.int8)

    for j in range(j_max):
        step = 1 << j
        sv = jnp.pad(v[..., step:], pad_cfg + [(0, step)], constant_values=neg)
        so = jnp.pad(off8[..., step:], pad_cfg + [(0, step)])
        # the left span's candidate always has the smaller absolute index
        # (its offset < step <= any right candidate's step + offset), so
        # v >= sv keeps the first-occurrence tie rule
        take = v >= sv
        v = jnp.where(take, v, sv)
        off8 = jnp.where(take, off8, so + jnp.int8(step))
    return v, off8, span, w


def sliding_argmax(rows: jnp.ndarray, half: int, max_levels: int = 4):
    """(max value, FIRST-max index) over the clamped window [c-half, c+half]
    for EVERY center c, via a sparse table (doubling) + multi-span combine.

    rows: [..., n] -> (values [..., n] f32, indices [..., n] i32).

    Pure shifted slices: level j combines each position with the one 2^j to
    its right; a window of width w is then the combine of ceil(w / 2^J)
    overlapping 2^J spans left-to-right -- overlap is harmless for max, and
    first-occurrence index survives because the earlier span wins ties
    (a later span's equal-valued smaller index would lie inside an earlier
    span, contradiction). Arbitrary-index gathers are scalar-slow on TPU;
    this replaces the per-candidate window gather that dominated the scan
    step. Edge windows shrink like the host get_max_index (the -inf padding
    never wins).

    max_levels trades full-array level passes for extra (cheap) combine
    lookups; 4 levels (span 16, 7 lookups at w=103) measured 10% faster than
    6 levels + 2 lookups on v5e (scripts/profile_slidemax.py A/B). The
    argmax rides the levels as an int8 OFFSET from the span anchor (4x less
    index traffic than absolute int32); absolute indices materialize once.
    """
    *lead, n = rows.shape
    v, off8, span, w = _sliding_span_tables(rows, half, max_levels)
    # cover [c, c+w-1] (padded coords) with spans at c, c+span, ...,
    # c+w-span; left-to-right combine keeps the first-occurrence rule
    starts = list(range(0, w - span, span)) + [w - span]
    pos = jnp.arange(n, dtype=jnp.int32) - half  # window start in bin coords
    bv = v[..., :n]
    bi = pos + off8[..., :n].astype(jnp.int32)
    for s in starts[1:]:
        cv = v[..., s : s + n]
        take = bv >= cv
        bv = jnp.where(take, bv, cv)
        bi = jnp.where(take, bi, pos + s + off8[..., s : s + n].astype(jnp.int32))
    return bv, bi


def sliding_argmax_code(
    rows: jnp.ndarray, half: int, level: jnp.ndarray, max_levels: int = 3
):
    """Windowed first-max argmax at every center, compacted to ONE int8 CODE:
    the argmax's offset from the window start (0..2*half) when the window max
    is >= level, else -1.

    The history vote consumes exactly (was the max >= start_level?, where)
    per (row, center) -- transmission.cpp:132-154 counts argmax votes only
    from rows whose window max clears the level. max_levels default 3:
    round-5 A/B at 32x45 bf16 measured 34.5/36.8/60 ms net for 3/4/2 levels
    (fewer doubling passes, shorter lane rotations; bit-identical output). Folding both into one int8
    shrinks the vote table to 1 byte/element from the 8 (f32 value + i32
    index) the sliding_argmax form carried through the transpose + row
    gather, which is what pushed 48-band geometries into HBM spill
    (round-3 verdict weak #3). The absolute index reconstructs exactly as
    center - half + code (the -inf edge padding never wins, so code always
    points at a real bin).
    """
    *lead, n = rows.shape
    w = 2 * half + 1
    # codes are window-relative offsets 0..w-1 in ONE int8; wider windows
    # (group_size > 127, e.g. min_sample_rate 64 kHz at step 156.25 Hz)
    # must use the sliding_argmax pair-table form instead (compact_detection
    # falls back automatically)
    assert w <= 128, "int8 window-relative codes bound the window at 128"
    v, off8, span, w = _sliding_span_tables(rows, half, max_levels)
    starts = list(range(0, w - span, span)) + [w - span]
    bv = v[..., :n]
    rel = off8[..., :n]
    for s in starts[1:]:
        cv = v[..., s : s + n]
        take = bv >= cv
        bv = jnp.where(take, bv, cv)
        # s + off <= (w - span) + span - 1 = w - 1 <= 127: stays int8
        rel = jnp.where(take, rel, jnp.int8(s) + off8[..., s : s + n])
    return jnp.where(bv >= level, rel, jnp.int8(-1))


def _windowed_argmax(rows: jnp.ndarray, centers: jnp.ndarray, half: int, fft: int):
    """First-max argmax of rows[..., :] in [center-half, center+half] clamped.

    rows: [..., fft]; centers: [C] i32 -> values [..., C], indices [..., C].
    Clamping duplicates edge bins; first-occurrence argmax then resolves to
    the same index the reference's shrunken window produces.
    """
    w = 2 * half + 1
    offs = jnp.arange(-half, half + 1, dtype=jnp.int32)
    idx = jnp.clip(centers[:, None] + offs[None, :], 0, fft - 1)  # [C, w]
    gathered = rows[..., idx]  # [..., C, w]
    pos = jnp.argmax(gathered, axis=-1)  # first max
    best_idx = jnp.take_along_axis(
        jnp.broadcast_to(idx, pos.shape + (w,)), pos[..., None], axis=-1
    )[..., 0]
    best_val = jnp.take_along_axis(gathered, pos[..., None], axis=-1)[..., 0]
    return best_val, best_idx


@functools.lru_cache(maxsize=32)
def _vote_select_onehot(f: int, r_rows: int, half_depth: int) -> np.ndarray:
    """Static one-hot [F, R, H]: sel[k, r, h] = 1 iff r == k + h.

    Returned as numpy (NOT jnp): a cached jnp array created under one trace
    would leak that trace's constant into later jit traces.
    """
    sel = np.zeros((f, r_rows, half_depth), dtype=np.float32)
    for k in range(f):
        for h in range(half_depth):
            sel[k, k + h, h] = 1.0
    return sel


def _vote_windows(
    hist_val: jnp.ndarray,  # [R, fft] f32, R = half_depth-1 + F
    hist_idx: jnp.ndarray,  # [R, fft] i32
    cand_idx: jnp.ndarray,  # [F, K] i32
    half_depth: int,
):
    """Per-frame vote-window selection: out[k, h, c] = table[k+h, cand[k, c]].

    Transpose the tables so the candidate lookup is a MAJOR-axis row gather
    (contiguous R-wide rows -- the fast gather class on TPU), then pick each
    frame's H=half_depth rows out of R with a static one-hot contraction
    (exact: exactly one nonzero per output, and indices < 2^24 are exact in
    f32). The previous form was a flat minor-axis element gather of
    F*H*K*2 ~ 2.2M scalars, measured ~3x slower on v5e
    (scripts/profile_detect.py vote A/B).
    """
    f, n_cand = cand_idx.shape
    r_rows = hist_val.shape[0]
    # indices ride through f32 below: exact only below 2^24 (fft 131072
    # production is fine; a 16.7M-bin FFT would silently corrupt votes)
    assert hist_val.shape[-1] < 1 << 24, hist_val.shape
    gv = hist_val.T[cand_idx]  # [F, K, R] row gather
    gi = hist_idx.T[cand_idx].astype(jnp.float32)
    sel = jnp.asarray(_vote_select_onehot(f, r_rows, half_depth))
    # HIGHEST keeps the contraction in exact f32 on TPU (a default-precision
    # bf16 cast of the values would break bit-exact parity with the flat
    # gather); with one-hot weights the result is exact: one term per output.
    # Output layout [F, H, K]: K minor for the unrolled mode kernel.
    hp = jax.lax.Precision.HIGHEST
    vals = jnp.einsum("fkr,frh->fhk", gv, sel, precision=hp)
    idxs = jnp.einsum("fkr,frh->fhk", gi, sel, precision=hp).astype(jnp.int32)
    return vals, idxs


@functools.lru_cache(maxsize=32)
def _vote_row_select(f: int, half_depth: int) -> np.ndarray:
    """Static [F, 1, H] row indices: frame k votes over history rows k..k+H-1.

    numpy (NOT jnp): cached device arrays leak trace constants (see
    _vote_select_onehot).
    """
    return (
        np.arange(f, dtype=np.int32)[:, None, None]
        + np.arange(half_depth, dtype=np.int32)[None, None, :]
    )


def _vote_windows_code(
    code_tbl: jnp.ndarray,  # [R, fft] int8, R = half_depth-1 + F
    cand_idx: jnp.ndarray,  # [F, K] i32
    half_depth: int,
):
    """Per-frame vote-window selection over the compact int8 code table:
    out[k, h, c] = code_tbl[k+h, cand[k, c]].

    Same shape of computation as _vote_windows -- transpose so the candidate
    lookup is a MAJOR-axis row gather (contiguous R-wide rows), then select
    each frame's H rows -- but the table element is ONE byte (validity +
    offset fused by sliding_argmax_code) instead of the 8 (f32 value + i32
    index) the pair form moved, so the transposed working set shrinks 8x.
    After the row gather the array is tiny ([F, K, R] int8), so the H-of-R
    selection is a static take_along_axis instead of the one-hot einsum the
    f32 pair form needed.
    """
    f, n_cand = cand_idx.shape
    g = code_tbl.T[cand_idx]  # [F, K, R] int8 row gather
    sel = jnp.asarray(_vote_row_select(f, half_depth))  # [F, 1, H]
    picked = jnp.take_along_axis(
        g, jnp.broadcast_to(sel, (f, n_cand, half_depth)), axis=2
    )  # [F, K, H]
    return picked.transpose(0, 2, 1)  # [F, H, K]: K minor for the mode kernel


def _vote_windows_gather(
    hist: jnp.ndarray,  # [R, fft] history rows (f32 or bf16), R = H-1+F
    cand_idx: jnp.ndarray,  # [F, K] i32 candidate bins
    half: int,
    level: jnp.ndarray,
    half_depth: int,
):
    """History vote via CANDIDATE-WINDOW block gathers instead of the full
    sliding-argmax table. Returns (idxs [F, H, K] i32, valid [F, H, K] bool).

    The vote consumes (window max >= start_level?, first-argmax) for each
    (candidate, history row) pair -- F*K*H ~ 40k cells -- yet
    sliding_argmax_code builds them for EVERY center: R * fft ~ 7M cells,
    through 4 doubling levels + a 7-span combine that are lane-rotation
    bound (~30 ms net at 32 bands x F=45, the largest remaining detection
    line after round 4). This form computes only what is consumed:

    1. pad the history with half -inf bins per side (edge windows shrink
       like the host get_max_index; padding never wins) and transpose to
       [fft + 2*half, R] -- bin-major, so one candidate's window is 103
       CONSECUTIVE rows;
    2. ONE batched dynamic-slice gather of [w, R] blocks at the F*K
       candidate starts (contiguous ~11 KB slices, the fast gather class
       -- same lesson as _vote_windows' row gather, one level bigger);
    3. max + first-occurrence argmax over the window axis for all R rows
       (cheap VPU reduce over ~W x that of the consumed cells), then the
       per-frame H-of-R row selection exactly like _vote_windows_code.

    Bit-exact vs the table form: values are untouched row entries, argmax
    over the window axis keeps the first-occurrence rule (smaller w =
    smaller absolute index), and validity compares the same dtypes against
    the same level. Unlike the int8-code form it has NO w <= 128 bound, so
    it also serves wide group_size configs. Negative-space note: the
    round-2 vote used a flat per-candidate minor-axis element gather and
    lost 3x to the table forms -- the difference here is the gather moves
    CONTIGUOUS [w, R] blocks, not scattered scalars.
    """
    f, k = cand_idx.shape
    r_rows = hist.shape[0]
    n = hist.shape[-1]
    w = 2 * half + 1
    neg = -jnp.inf
    hist_t = jnp.pad(
        hist, [(0, 0), (half, half)], constant_values=neg
    ).T  # [n + 2*half, R], bin-major
    starts = cand_idx.reshape(-1)  # window start in padded coords = cand bin

    if VOTE_GATHER_LOWERING == "slice":
        g = jax.vmap(
            lambda s: jax.lax.dynamic_slice(
                hist_t, (s, jnp.zeros((), s.dtype)), (w, r_rows)
            )
        )(starts)  # [F*K, w, R]
    else:  # "index": one gather op over row indices start+0..w-1
        g = hist_t[starts[:, None] + jnp.arange(w, dtype=starts.dtype)[None, :]]
    vmax = jnp.max(g, axis=1).reshape(f, k, r_rows)  # [F, K, R]
    varg = jnp.argmax(g, axis=1).astype(jnp.int32).reshape(f, k, r_rows)

    sel = jnp.asarray(_vote_row_select(f, half_depth))  # [F, 1, H]
    sel_b = jnp.broadcast_to(sel, (f, k, half_depth))
    pick_max = jnp.take_along_axis(vmax, sel_b, axis=2)  # [F, K, H]
    pick_arg = jnp.take_along_axis(varg, sel_b, axis=2)
    valid = pick_max >= jnp.asarray(level, pick_max.dtype)
    idxs = cand_idx[:, :, None] - half + pick_arg
    # [F, H, K]: K minor for the unrolled mode kernel
    return idxs.transpose(0, 2, 1), valid.transpose(0, 2, 1)


def _mode_median_ties(votes: jnp.ndarray, valid: jnp.ndarray, fallback: jnp.ndarray):
    """C++ mostFrequentValue over the valid votes of each row.

    votes: [..., H] i32; valid: [..., H] bool; fallback used when none valid.
    Rule (collection_utils.h:29-50): among values sharing the max count, take
    the median of the sorted distinct values ([n_tied // 2]).
    """
    h = votes.shape[-1]
    big = jnp.int32(2**30)
    v = jnp.where(valid, votes, big)  # invalid sorts to the end
    eq = v[..., :, None] == v[..., None, :]  # [..., H, H]
    counts = jnp.sum(eq & valid[..., None, :], axis=-1)  # votes among valid
    counts = jnp.where(valid, counts, 0)
    maxc = jnp.max(counts, axis=-1, keepdims=True)
    is_tied = (counts == maxc) & valid
    # first occurrence of each value: no earlier position holds the same value
    earlier = jnp.tril(jnp.ones((h, h), dtype=bool), k=-1)
    first_occ = jnp.sum(eq & earlier, axis=-1) == 0
    rep = is_tied & first_occ  # distinct tied values, one representative each
    # sort distinct tied values ascending; pick element [n_tied // 2]
    tied_sorted = jnp.sort(jnp.where(rep, v, big), axis=-1)
    n_tied = jnp.sum(rep, axis=-1)
    pick = jnp.take_along_axis(
        tied_sorted, (n_tied // 2)[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    any_valid = jnp.any(valid, axis=-1)
    return jnp.where(any_valid, pick, fallback)


def _mode_median_ties_unrolled(
    votes: jnp.ndarray, valid: jnp.ndarray, fallback: jnp.ndarray
):
    """C++ mostFrequentValue, unrolled over the small history depth H.

    votes/valid: [..., H, K] (K minor); fallback: [..., K]. Semantics are
    identical to _mode_median_ties (same rule, collection_utils.h:29-50), but
    every op runs elementwise over [..., K] slices -- H is a PYTHON loop, so
    no [.., H, H] arrays with an 11-wide minor axis exist (those pad to 128
    lanes at <9% utilization on TPU and dominated the vote's cost). The ~300
    unrolled ops fuse into one VPU kernel over the K-minor layout.
    """
    h = votes.shape[-2]
    big = jnp.int32(2**30)
    v = jnp.where(valid, votes, big)
    vs = [v[..., i, :] for i in range(h)]
    ok = [valid[..., i, :] for i in range(h)]
    counts = []
    for i in range(h):
        c = jnp.zeros(vs[i].shape, dtype=jnp.int32)
        for j in range(h):
            c = c + jnp.where((vs[i] == vs[j]) & ok[j], 1, 0)
        counts.append(jnp.where(ok[i], c, 0))
    maxc = counts[0]
    for i in range(1, h):
        maxc = jnp.maximum(maxc, counts[i])
    reps = []
    for i in range(h):
        rep = (counts[i] == maxc) & ok[i]
        for j in range(i):  # first occurrence of each distinct value
            rep = rep & (vs[i] != vs[j])
        reps.append(rep)
    vals = [jnp.where(reps[i], vs[i], big) for i in range(h)]
    for p in range(h):  # odd-even transposition sort, ascending
        for i in range(p % 2, h - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            vals[i + 1] = jnp.maximum(vals[i], vals[i + 1])
            vals[i] = lo
    n_tied = reps[0].astype(jnp.int32)
    for i in range(1, h):
        n_tied = n_tied + reps[i].astype(jnp.int32)
    pick = n_tied // 2  # median of the sorted distinct tied values
    res = vals[0]
    for i in range(1, h):
        res = jnp.where(pick == i, vals[i], res)
    any_valid = ok[0]
    for i in range(1, h):
        any_valid = any_valid | ok[i]
    return jnp.where(any_valid, res, fallback)


def compact_detection(
    avg: jnp.ndarray,  # [F, fft] smoothed rows
    raw: jnp.ndarray,  # [F, fft] raw (noise-subtracted) rows of this block
    prev_tail: jnp.ndarray,  # [half-1, fft] newest ordered ring rows pre-block
    keys: jnp.ndarray,  # [S] i32 tracked signal keys (block start)
    valid_mask: jnp.ndarray,  # [fft] bool: in-range & not ignored
    start_level: float,
    group_size: int,
    top_k: int,
    bf16: bool = False,
    pallas_select: bool = False,
) -> CompactOutputs:
    """bf16=True is the TOLERANCE mode (tunables.detection_bf16): only the
    SELECTION sweeps -- top-k, margin-separated greedy, history-vote table --
    read bf16 copies of the rows (the detection stages' row traffic halves;
    they are the memory-bound majority of device time, BENCH.md roofline).
    Every reported VALUE stays exact f32: candidate powers are re-gathered
    from the f32 rows at the selected bins, and per-key argmax stays f32, so
    host threshold decisions (add/update/flush) see full-precision numbers.
    What can move vs f32 mode: which bin WINS a selection when two bins lie
    within bf16 epsilon (2^-8 relative, ~0.03 dB at the default level 8) of
    each other -- same-cluster neighbors, absorbed by the +-group re-center;
    and the vote-support / overflow-count thresholds gain bf16 granularity.
    Decision-equality is pinned by tests/test_detect_bf16.py; compact f32
    and full-row f32 remain the exact parity ladder."""
    f, fft = avg.shape
    half = group_size // 2
    neg = jnp.float32(-3.0e38)

    masked = jnp.where(valid_mask[None, :], avg, neg)
    sel = masked.astype(jnp.bfloat16) if bf16 else masked
    submargin = group_size // 2 if group_size % 2 == 0 else group_size // 2 + 1
    if pallas_select and fft % 1024 == 0 and 2 * submargin + 1 <= 1024:
        # ONE VMEM-resident pass per row replaces the pooled top-k, the
        # margin sweep passes, and the count reduce (bit-exact; see
        # ops/pallas/select_kernel.py and tests/test_pallas_select.py)
        from rtl_sdr_scanner_tpu.ops.pallas.select_kernel import fused_selection

        top_val, top_idx, sep_val, sep_idx, cand_count = fused_selection(
            sel, jnp.asarray(start_level, jnp.float32), top_k, K_SEP, submargin
        )
    else:
        # top-k stays the pooled-sort form. The patch alternative (k
        # single-bin-zone winners via _margin_separated_top(sel, k, 0,
        # per_pass=k) -- identical output order, proven on-device) measured
        # 58.5 vs 65.3 ms isolated at the 1440-row headline geometry but
        # LOST 18% end to end at the wideband app geometry (160 rows): 64
        # sequential winner steps amortize per-step latency only over
        # enough rows, and compact_detection cannot see the vmapped band
        # count at trace time. Geometry-dependent negative result
        # (BENCH.md); the margin sweep's 16 winners stay single-pass,
        # which wins at every measured geometry.
        top_val, top_idx = _pooled_top_k(sel, top_k)
        sep_val, sep_idx = _margin_separated_top(sel, K_SEP, submargin)
        cand_count = jnp.sum(
            sel >= jnp.asarray(start_level, sel.dtype), axis=-1
        ).astype(jnp.int32)
    cand_idx = jnp.concatenate([top_idx, sep_idx], axis=1)
    if bf16:
        # exact f32 powers at the bf16-selected bins (tiny [F, K] gather)
        cand_val = jnp.take_along_axis(masked, cand_idx, axis=1)
    else:
        cand_val = jnp.concatenate([top_val, sep_val], axis=1)

    # history vote: rows k-10..k (global) = hist[k : k+half_depth]. The
    # windowed argmax is precomputed at EVERY center via the doubling-table
    # sweep (shifted slices only) and compacted to ONE int8 code per center
    # (validity-vs-start_level + window offset fused, sliding_argmax_code);
    # the per-(frame, row, candidate) result is then a row gather of 1-byte
    # elements. The f32+i32 pair tables this replaces moved 8 bytes/element
    # through the transpose + gather and spilled HBM at 48 bands.
    hist = jnp.concatenate([prev_tail, raw], axis=0)  # [half_depth-1+F, fft]
    if bf16:
        hist = hist.astype(jnp.bfloat16)
    half_depth = prev_tail.shape[0] + 1
    if VOTE_FORM == "gather":
        # candidate-window block-gather vote (no sliding table; any width)
        idxs, votes_valid = _vote_windows_gather(
            hist, cand_idx, half, start_level, half_depth
        )
    elif 2 * half + 1 <= 128:
        code_tbl = sliding_argmax_code(hist, half, start_level)  # [H-1+F, fft] i8
        codes = _vote_windows_code(code_tbl, cand_idx, half_depth)  # [F, H, K] i8
        votes_valid = codes >= 0
        # absolute vote index = window start + offset (padding never wins)
        idxs = (cand_idx[:, None, :] - half) + codes.astype(jnp.int32)
    else:
        # wide-window fallback (group_size > 127: e.g. min_sample_rate 64 kHz
        # at step 156.25 Hz -> group 410): int8 codes cannot encode the
        # window offset, so the vote uses the f32+i32 pair tables
        # (round-3 production form; round-4 advisor high finding)
        hist_val, hist_idx = sliding_argmax(hist, half)
        vote_val, idxs = _vote_windows(hist_val, hist_idx, cand_idx, half_depth)
        votes_valid = vote_val >= jnp.asarray(start_level, vote_val.dtype)
    cand_best = _mode_median_ties_unrolled(idxs, votes_valid, cand_idx)  # [F, K]

    key_val, key_idx = jax.vmap(lambda row: _windowed_argmax(row, keys, half, fft))(avg)

    return CompactOutputs(
        cand_idx=cand_idx.astype(jnp.int32),
        cand_val=cand_val,
        cand_best=cand_best.astype(jnp.int32),
        cand_count=cand_count,
        key_val=key_val,
        key_idx=key_idx.astype(jnp.int32),
    )
