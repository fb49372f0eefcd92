"""Fused scan+DDC block step: the full per-band device program in ONE jit.

The reference runs detection and recording as two concurrently-scheduled
GR chains off the same source (sources/radio/sdr_device.cpp:161-181,
recorder.cpp:14-46). Here both consume the same int8 block inside a single
jitted program, so one dispatch per block covers the whole device side and
XLA schedules the DDC's MXU contractions alongside the scan's FFT/VPU work.

The runtime keeps separate steps when no recorder slot is live (scan only);
this fused form is the steady-state "recording while scanning" path and the
benchmark configuration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rtl_sdr_scanner_tpu.models.ddc_pipeline import DdcConfig, _ddc_block
from rtl_sdr_scanner_tpu.models.scan_pipeline import (
    CompactScanOutputs,
    ScanConfig,
    ScanState,
    _compact_scan_block,
)
from rtl_sdr_scanner_tpu.ops.ddc import DdcState, NcoTables


class FusedOutputs(NamedTuple):
    packed: jnp.ndarray  # compact scan outputs, one f32 vector (scan_pipeline)
    recording: jnp.ndarray  # [num_slots, out_per_block, 2] int8 IQ


def _fused_block(
    scan_cfg: ScanConfig,
    ddc_cfg: DdcConfig,
    group_size: int,
    top_k: int,
    scan_state: ScanState,
    spectro_acc: jnp.ndarray,  # [spectro_size] f32 device accumulator
    ddc_state: DdcState,
    iq: jnp.ndarray,  # [frames, fft*decim, 2] int8 cs8 (or [frames, fft*decim] c64)
    now_ms: jnp.ndarray,  # [frames] i32
    keys: jnp.ndarray,  # [S] i32
    valid_mask: jnp.ndarray,  # [fft] bool
    start_level: jnp.ndarray,  # scalar f32
    spectro_keep: jnp.ndarray,  # scalar f32
    tables: NcoTables,
) -> Tuple[ScanState, jnp.ndarray, DdcState, FusedOutputs]:
    scan_state, spectro_acc, outs = _compact_scan_block(
        scan_cfg, group_size, top_k, scan_state, spectro_acc, iq, now_ms,
        keys, valid_mask, start_level, spectro_keep
    )
    flat = iq.reshape(-1, 2) if iq.ndim == 3 else iq.reshape(-1)
    ddc_state, rec = _ddc_block(ddc_cfg, ddc_state, flat, tables)
    return scan_state, spectro_acc, ddc_state, FusedOutputs(packed=outs.packed, recording=rec)


_STEP_CACHE: dict = {}


def make_fused_step(
    scan_cfg: ScanConfig, ddc_cfg: DdcConfig, group_size: int, top_k: int = 64
):
    """Jitted fused step: (scan_state, ddc_state, iq, now, keys, valid,
    start_level, tables) -> (scan_state, ddc_state, FusedOutputs)."""
    key = (
        scan_cfg,
        ddc_cfg.sample_rate,
        ddc_cfg.bandwidth,
        ddc_cfg.num_slots,
        ddc_cfg.chunk,
        ddc_cfg.num_chunks,
        group_size,
        top_k,
    )
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = jax.jit(
            functools.partial(_fused_block, scan_cfg, ddc_cfg, group_size, top_k),
            donate_argnums=(0, 1, 2),
        )
    return _STEP_CACHE[key]


def make_banded_fused_step(
    scan_cfg: ScanConfig,
    ddc_cfg: DdcConfig,
    group_size: int,
    top_k: int = 64,
    use_pallas_fir: bool = False,
):
    """Fused step over ALL bands (benchmark / concurrent-band runtime).

    Scan is vmapped per band; the DDC runs banded -- bands folded into the
    batch rows of one kernel per resampler stage (models/ddc_pipeline.py
    _ddc_block_banded), which enables the Pallas FIR path on TPU.

    Band axis on: scan_state, iq, now_ms. FOLDED [NB*K, ...] leaves
    (ddc_pipeline.fold_banded) on: ddc_state, tables. Shared: keys,
    valid_mask, start_level.
    """
    from rtl_sdr_scanner_tpu.models.ddc_pipeline import _ddc_block_banded

    key = (
        "banded",
        scan_cfg,
        ddc_cfg.sample_rate,
        ddc_cfg.bandwidth,
        ddc_cfg.num_slots,
        ddc_cfg.chunk,
        ddc_cfg.num_chunks,
        group_size,
        top_k,
        use_pallas_fir,
    )
    if key not in _STEP_CACHE:
        scan_fn = jax.vmap(
            functools.partial(_compact_scan_block, scan_cfg, group_size, top_k),
            in_axes=(0, 0, 0, 0, None, None, None, None),
        )

        def banded(
            scan_state, spectro_acc, ddc_state, iq, now_ms, keys, valid_mask,
            start_level, spectro_keep, tables,
        ):
            scan_state, spectro_acc, outs = scan_fn(
                scan_state, spectro_acc, iq, now_ms, keys, valid_mask,
                start_level, spectro_keep,
            )
            nb = iq.shape[0]
            flat = iq.reshape(nb, -1, 2) if iq.ndim == 4 else iq.reshape(nb, -1)
            ddc_state, rec = _ddc_block_banded(
                ddc_cfg, nb, use_pallas_fir, ddc_state, flat, tables
            )
            return scan_state, spectro_acc, ddc_state, FusedOutputs(
                packed=outs.packed, recording=rec
            )

        _STEP_CACHE[key] = jax.jit(banded, donate_argnums=(0, 1, 2))
    return _STEP_CACHE[key]


__all__ = ["FusedOutputs", "make_fused_step", "make_banded_fused_step"]
