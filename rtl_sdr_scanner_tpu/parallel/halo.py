"""Overlap-save halo exchange for time-sharded filtering.

When one band's IQ stream is sharded across chips on the time axis, every FIR
stage needs the last (ntaps-1) upsampled-domain samples of the PREVIOUS time
shard to produce exact outputs at the seam -- the distributed generalization
of the per-block tails carried in ops/ddc.py. The halo rides a collective
permute over ICI (SURVEY.md section 5 long-context equivalent; SNIPPETS.md
[2][3] pattern).

Convention: shard s processes samples [s*n, (s+1)*n) of the global stream.
Shard 0 receives zeros (causal stream start), matching the single-chip
streaming state initialization.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rtl_sdr_scanner_tpu.ops.ddc import StagePlan, _stage_apply


def halo_from_left(x: jnp.ndarray, halo_len: int, axis_name: str) -> jnp.ndarray:
    """Return each shard's left halo: the last halo_len samples (axis -1) of
    the previous shard along `axis_name`; zeros on shard 0.

    Must be called inside shard_map with `axis_name` in scope.
    """
    n_shards = jax.lax.axis_size(axis_name)
    tail = x[..., -halo_len:]
    # send my tail to my right neighbor (s -> s+1); shard 0 gets nothing
    perm = [(s, s + 1) for s in range(n_shards - 1)]
    return jax.lax.ppermute(tail, axis_name, perm)


def resample_chain_sharded(
    x: jnp.ndarray, plans: Sequence[StagePlan], axis_name: str
) -> jnp.ndarray:
    """Run the staged resampler on a time-sharded stream with halo exchange.

    x: this shard's samples as [K, 2, n] float32 (same layout as the
    single-chip chain). Output equals the single-chip streaming chain run over
    the concatenated stream, split at the shard boundaries.

    Each stage: fetch the input-domain tail (plan.tail_len samples) from the
    left neighbor, then apply the same strided/dilated conv as ops/ddc.
    Intermediate rates shrink stage by stage, so later halos are tiny.
    """
    for plan in plans:
        tail = halo_from_left(x, plan.tail_len, axis_name)
        x, _ = _stage_apply(x, tail, plan)
    return x
