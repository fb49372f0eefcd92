"""The recorder bank "model": batched K-slot DDC over a block.

Replaces the reference's pool of dynamically attached recorder chains
(sources/radio/sdr_device.cpp:39-41, recorder.cpp:14-46) with a fixed-capacity
batched kernel: all K slots always compute; the host reconciles which slots
are live (runtime/sdr_device.py) and discards masked output, which is the
fixed-shape TPU answer to dynamic graph surgery.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops import ddc as ddc_ops
from rtl_sdr_scanner_tpu.ops.ddc import (
    Ddc2State,
    DdcState,
    ModTables,
    NcoTables,
    StagePlan,
    chain_block_multiple,
    chain_output_length,
    init_ddc2_state,
    init_ddc_state,
    make_mod_tables,
    make_nco_tables,
    plan_chain,
    reset_slot2,
)
from rtl_sdr_scanner_tpu.ops.ddc import reset_slot as _reset_slot_v1


@dataclasses.dataclass(frozen=True)
class DdcConfig:
    sample_rate: int
    bandwidth: int  # recording.min_sample_rate (config.cpp:79)
    num_slots: int  # recorder pool size (config.cpp:135-139)
    chunk: int  # samples per inner scan chunk
    num_chunks: int  # chunks per block
    plans: Tuple[StagePlan, ...]

    @classmethod
    def create(
        cls,
        sample_rate: int,
        bandwidth: int,
        num_slots: int,
        block_samples: int,
        resampler_threshold: int = 125,
        chunk_target: int = 1 << 21,
    ) -> "DdcConfig":
        plans = tuple(plan_chain(sample_rate, bandwidth, resampler_threshold))
        mult = chain_block_multiple(plans)
        # chunk: big enough to amortize dispatch, divisible into the block and
        # by the chain multiple. chunk_target ~2M samples keeps rotation
        # buffers in HBM modest; a round-5 A/B at the headline geometry
        # measured an 8M target 24% SLOWER (1512 vs 1998 M samples/s,
        # BENCH.md -- the bigger per-chunk rotation/z buffers pressure HBM),
        # so 2M stays the default.
        chunk = block_samples
        num_chunks = 1
        target = chunk_target
        while chunk > target and chunk % 2 == 0 and (chunk // 2) % mult == 0:
            chunk //= 2
            num_chunks *= 2
        if block_samples % mult != 0:
            raise ValueError(
                f"block_samples {block_samples} not divisible by resampler multiple {mult}"
            )
        return cls(sample_rate, bandwidth, num_slots, chunk, num_chunks, plans)

    @property
    def block_samples(self) -> int:
        return self.chunk * self.num_chunks

    @property
    def out_per_block(self) -> int:
        return chain_output_length(self.plans, self.block_samples)

    @property
    def modtap(self) -> bool:
        """True when the modulated-taps path (ops/ddc.py v2: rotation folded
        into stage 1, ~4x less stage-1 HBM traffic) applies: a decimation-only
        first stage with the chunked-matmul form available."""
        return self.plans[0].interp == 1 and self.plans[0].chunk_c > 0


def init_state(cfg: DdcConfig):
    if cfg.modtap:
        return init_ddc2_state(cfg.plans, cfg.num_slots)
    return init_ddc_state(cfg.plans, cfg.num_slots)


def reset_slot(state, slot: int):
    """Zero one slot's carry (dispatches on the state flavor)."""
    if isinstance(state, Ddc2State):
        return reset_slot2(state, slot)
    return _reset_slot_v1(state, slot)


def make_tables(cfg: DdcConfig, shifts: np.ndarray):
    """Per-slot NCO/modulated-tap tables; host refreshes when a slot's shift
    changes (recorder startRecording, recorder.cpp:58-73)."""
    if cfg.modtap:
        return make_mod_tables(cfg.plans, shifts, cfg.sample_rate, cfg.chunk)
    return make_nco_tables(shifts, cfg.sample_rate, cfg.chunk)


def _ddc_block(
    cfg: DdcConfig, state, iq: jnp.ndarray, tables
) -> Tuple[DdcState, jnp.ndarray]:
    """iq: [block_samples] complex64, or [block_samples, 2] int8 cs8 / f32
    pairs -> int8 out [num_slots, out_per_block, 2]."""
    if cfg.modtap:
        # single band as NB=1 through the banded modtap kernel
        if iq.ndim == 2:
            chunks = iq.reshape(cfg.num_chunks, 1, cfg.chunk, 2)
        else:
            chunks = iq.reshape(cfg.num_chunks, 1, cfg.chunk)
        state_b = jax.tree.map(lambda a: a[None], state)
        tables_b = jax.tree.map(lambda a: a[None], tables)

        def body(carry, chunk_iq):
            new_state, out = ddc_ops.ddc_chunk_modtap(chunk_iq, carry, tables_b, cfg.plans)
            return new_state, out

        state_b, outs = jax.lax.scan(body, state_b, chunks)
        state = jax.tree.map(lambda a: a[0], state_b)
        # [num_chunks, 1, K, chunk_out, 2] -> [K, block_out, 2]
        out = jnp.moveaxis(outs[:, 0], 0, 1).reshape(cfg.num_slots, -1, 2)
        return state, out

    if iq.ndim == 2:
        chunks = iq.reshape(cfg.num_chunks, cfg.chunk, 2)
    else:
        chunks = iq.reshape(cfg.num_chunks, cfg.chunk)

    def body(carry, chunk_iq):
        new_state, out = ddc_ops.ddc_chunk(chunk_iq, carry, tables, cfg.plans)
        return new_state, out

    state, outs = jax.lax.scan(body, state, chunks)
    # [num_chunks, K, chunk_out, 2] -> [K, block_out, 2]
    out = jnp.moveaxis(outs, 0, 1).reshape(cfg.num_slots, -1, 2)
    return state, out


def _ddc_block_banded(
    cfg: DdcConfig,
    n_bands: int,
    use_pallas_fir: bool,
    state: DdcState,  # leaves folded to leading dim n_bands * num_slots
    iq: jnp.ndarray,  # [NB, block_samples(,2)]
    tables: NcoTables,  # leaves folded to leading dim n_bands * num_slots
) -> Tuple[DdcState, jnp.ndarray]:
    """All-bands DDC block: one kernel per stage over NB*K*2 batch rows
    (enables the Pallas FIR path; see ops/ddc.py ddc_chunk_banded).
    Returns int8 [NB, K, out_per_block, 2]."""
    nb = iq.shape[0]
    if iq.ndim == 3:
        chunks = iq.reshape(nb, cfg.num_chunks, cfg.chunk, 2)
    else:
        chunks = iq.reshape(nb, cfg.num_chunks, cfg.chunk)
    chunks = jnp.moveaxis(chunks, 1, 0)  # [num_chunks, NB, ...]

    # modtap supersedes the Pallas FIR path: the matmul already runs on the
    # MXU and stage 1 no longer exists as a standalone FIR (see ops/ddc.py)
    if cfg.modtap:

        def body2(carry, chunk_iq):
            new_state, out = ddc_ops.ddc_chunk_modtap(chunk_iq, carry, tables, cfg.plans)
            return new_state, out

        state, outs = jax.lax.scan(body2, state, chunks)
        out = jnp.moveaxis(outs, 0, 2).reshape(nb, cfg.num_slots, -1, 2)
        return state, out

    def body(carry, chunk_iq):
        new_state, out = ddc_ops.ddc_chunk_banded(
            chunk_iq, carry, tables, cfg.plans, nb, use_pallas_fir
        )
        return new_state, out

    state, outs = jax.lax.scan(body, state, chunks)
    # [num_chunks, NB, K, chunk_out, 2] -> [NB, K, block_out, 2]
    out = jnp.moveaxis(outs, 0, 2).reshape(nb, cfg.num_slots, -1, 2)
    return state, out


def fold_banded(tree):
    """Stack-of-bands pytree -> banded-DDC layout.

    v1 (NcoTables / DdcState): [NB, K, ...] leaves fold to [NB*K, ...].
    v2 (ModTables / Ddc2State): the banded layout IS the stacked [NB, ...]
    layout; returned unchanged."""
    if isinstance(tree, (Ddc2State, ModTables)):
        return tree
    return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), tree)


# StagePlan holds numpy kernels (unhashable), so cache on the scalar geometry.
_STEP_CACHE: dict = {}


def make_ddc_step(cfg: DdcConfig):
    key = (cfg.sample_rate, cfg.bandwidth, cfg.num_slots, cfg.chunk, cfg.num_chunks)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = jax.jit(
            functools.partial(_ddc_block, cfg), donate_argnums=(0,)
        )
    return _STEP_CACHE[key]


__all__ = [
    "DdcConfig",
    "DdcState",
    "Ddc2State",
    "ModTables",
    "init_state",
    "make_tables",
    "make_ddc_step",
    "reset_slot",
]
