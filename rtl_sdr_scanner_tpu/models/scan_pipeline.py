"""The fused detection pipeline -- the framework's flagship "model".

One jitted program replaces the reference's entire GR detection flowgraph
(sources/radio/sdr_device.cpp:161-171):

  stream_to_vector -> Blocker -> Decimator -> fft_v(hamming) -> PSD
  -> NoiseLearner -> [Averager + freq smoothing inside Transmission]

Structure (TPU-first):
- All frames of a block are FFT'd/PSD'd as ONE batched transform (MXU/VPU
  friendly, no per-frame dispatch).
- The sequential carries (noise max-hold, averager ring) are folded into
  whole-block forms (ops/noise.py noise_block, ops/averager.py
  averager_block): readiness is time-monotone and the boxcar is a cumsum,
  so no per-frame lax.scan is needed.
- Outputs per block: raw power rows (power - noise floor), time+frequency
  smoothed rows, and the spectrogram bin accumulation. The host detector
  (runtime/transmission_tracker.py) consumes these at the reference's
  <=50 rows/s cadence.

The Blocker/skip gating of the reference (blocker.cpp) is a host concern here:
the host simply does not feed blocks while retuning, and drops the one stale
block after retune (sdr_device.cpp:78).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.constants import DEFAULT, Tunables
from rtl_sdr_scanner_tpu.ops.averager import AveragerState, averager_block, init_averager_state
from rtl_sdr_scanner_tpu.ops.noise import NoiseState, init_noise_state, noise_block
from rtl_sdr_scanner_tpu.ops.psd import dequantize_cs8, pairs_to_complex, psd_frames
from rtl_sdr_scanner_tpu.ops.smooth import sliding_average
from rtl_sdr_scanner_tpu.ops.spectrogram import accumulate_frames, spectrogram_output_size
from rtl_sdr_scanner_tpu.utils.radio_utils import get_fft


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Static geometry of one band's detection pipeline.

    Derived exactly like SdrDevice::setupChains (sdr_device.cpp:148-159).
    """

    sample_rate: int
    fft_size: int
    decimator_factor: int
    frames_per_block: int
    spectro_size: int
    grouping_x: int = 21
    grouping_y: int = 21
    noise_learning_ms: int = 2000

    use_pallas_psd: bool = False
    # tolerance mode: detection SELECTION sweeps read bf16 row copies;
    # reported values stay f32 (ops/detect.py compact_detection docstring)
    detection_bf16: bool = False
    # deeper tolerance: STORE the noise-subtracted rows (averager ring,
    # history-vote rows) in bf16 (constants.Tunables.power_bf16 docstring:
    # FFT/noise/spectrogram stay exact f32; derived powers move <= 2^-9
    # relative of the dB value). Only meaningful with detection_bf16 --
    # create() clears it otherwise so state dtypes stay consistent.
    power_bf16: bool = False
    # fused Pallas selection kernel (ops/pallas/select_kernel.py), bit-exact
    use_pallas_select: bool = False

    @classmethod
    def create(
        cls, sample_rate: int, frames_per_block: int = 16, tunables: Tunables = DEFAULT
    ) -> "ScanConfig":
        fft_size = get_fft(sample_rate, tunables.signal_detection_max_step)
        step = sample_rate / fft_size
        decim = 1 if tunables.dense_detection else max(
            1, int(step / tunables.signal_detection_fps)
        )
        return cls(
            sample_rate=sample_rate,
            fft_size=fft_size,
            decimator_factor=decim,
            frames_per_block=frames_per_block,
            spectro_size=spectrogram_output_size(
                fft_size,
                sample_rate,
                tunables.spectrogram_max_fft,
                tunables.spectrogram_preferred_max_step,
            ),
            grouping_x=tunables.grouping_x,
            grouping_y=tunables.grouping_y,
            noise_learning_ms=tunables.noise_learning_time_ms,
            use_pallas_psd=tunables.use_pallas_psd,
            detection_bf16=tunables.detection_bf16,
            power_bf16=tunables.power_bf16 and tunables.detection_bf16,
            use_pallas_select=tunables.use_pallas_select,
        )

    @property
    def step_hz(self) -> float:
        return self.sample_rate / self.fft_size

    @property
    def block_samples(self) -> int:
        return self.frames_per_block * self.fft_size * self.decimator_factor

    @property
    def frame_interval_ms(self) -> float:
        return self.fft_size * self.decimator_factor * 1000.0 / self.sample_rate

    def index_to_shift(self, index: int) -> int:
        """Bin index -> frequency shift from center (sdr_device.cpp:154)."""
        return int(self.step_hz * (index + 0.5)) - self.sample_rate // 2

    def index_to_frequency(self, index: int, center: int) -> int:
        return center + self.index_to_shift(index)


class ScanState(NamedTuple):
    noise: NoiseState
    averager: AveragerState


class ScanOutputs(NamedTuple):
    raw: jnp.ndarray  # [frames, fft] power - noise floor (or NO_DATA sentinel)
    avg: jnp.ndarray  # [frames, fft] time+frequency smoothed (or sentinel)
    spectro_sum: jnp.ndarray  # [spectro_size] PSD bin-mean sum over frames
    noise_ready: jnp.ndarray  # scalar bool AFTER this block
    power: jnp.ndarray  # [frames, fft] raw PSD pre-noise (debug tap parity,
    # sdr_device.cpp:175 taps the PSD block output before NoiseLearner)


def init_scan_state(cfg: ScanConfig, start_ms: int = 0) -> ScanState:
    ring_dtype = jnp.bfloat16 if cfg.power_bf16 else jnp.float32
    return ScanState(
        noise=init_noise_state(cfg.fft_size, start_ms),
        averager=init_averager_state(cfg.fft_size, cfg.grouping_y, ring_dtype),
    )


def _frames_power(cfg: ScanConfig, iq: jnp.ndarray) -> jnp.ndarray:
    """[frames, fft*decim] c64, or [frames, fft*decim, 2] int8 cs8 / f32
    pairs (complex64 never crosses the host<->device boundary) -> PSD rows."""
    if iq.dtype == jnp.int8 and cfg.use_pallas_psd:
        from rtl_sdr_scanner_tpu.ops.pallas.psd_kernel import psd_frames_int8_pallas

        return psd_frames_int8_pallas(
            iq, float(cfg.sample_rate), cfg.fft_size, cfg.decimator_factor
        )
    iq = iq[:, : cfg.fft_size]  # Decimator FIRST: dequant only what the FFT eats
    if iq.dtype == jnp.int8:
        iq = dequantize_cs8(iq)
    elif iq.ndim == 3:
        iq = pairs_to_complex(iq)
    return psd_frames(iq, float(cfg.sample_rate))


def _scan_block(
    cfg: ScanConfig, state: ScanState, iq: jnp.ndarray, now_ms: jnp.ndarray
) -> Tuple[ScanState, ScanOutputs]:
    """iq: [frames, fft*decim] complex64 (pre-framed) or [frames, fft*decim, 2]
    int8 cs8; now_ms: [frames] i32 relative milliseconds."""
    power = _frames_power(cfg, iq)

    noise_state, raw_rows = noise_block(state.noise, power, now_ms, cfg.noise_learning_ms)
    avg_state, mean_rows = averager_block(state.averager, raw_rows)
    state = ScanState(noise_state, avg_state)
    avg_rows = sliding_average(mean_rows, cfg.grouping_x)
    spectro = accumulate_frames(power, cfg.spectro_size)
    return state, ScanOutputs(
        raw=raw_rows,
        avg=avg_rows,
        spectro_sum=spectro,
        noise_ready=state.noise.ready,
        power=power,
    )


@functools.lru_cache(maxsize=16)
def make_scan_step(cfg: ScanConfig):
    """Jitted block step for a given pipeline geometry."""
    return jax.jit(functools.partial(_scan_block, cfg), donate_argnums=(0,))


# -- compact mode -----------------------------------------------------------
#
# Full rows cost fft_size*4 bytes/frame device->host; compact mode keeps the
# detector math on device (ops/detect.py) and ships a few KB per block. The
# runtime uses it by default on TPU; full mode is the parity reference.


class CompactScanOutputs(NamedTuple):
    compact: "CompactOutputs"  # noqa: F821
    noise_ready: jnp.ndarray  # scalar bool AFTER this block
    # everything above packed into ONE f32 vector so the host needs a single
    # device->host transfer per block (tunnel/PCIe round trips dominate at
    # high block rates). Layout: [frames * (3K + 1 + 2S)] frame rows
    # (cand_idx, cand_val, cand_best, cand_count, key_val, key_idx), then
    # noise_ready. All index values are < 2^24, exact in f32.
    #
    # The spectrogram bin sum is NOT shipped per block: the reference only
    # egresses spectrograms at 1 Hz (spectrogram.cpp:62-75), so compact mode
    # accumulates it in a device-resident carry (spectro_acc) that the host
    # fetches at the send cadence -- per-block egress would dominate the
    # device->host link at high block rates (it was ~3x the detector data).
    packed: jnp.ndarray


def init_spectro_acc(cfg: ScanConfig) -> jnp.ndarray:
    """Device-side spectrogram accumulator (sum over frames of bin means)."""
    return jnp.zeros((cfg.spectro_size,), dtype=jnp.float32)


def unpack_compact(packed: "np.ndarray", frames: int, top_k: int, key_slots: int):
    """Host-side decode of CompactScanOutputs.packed (single fetch).

    top_k is the plain-top-K setting; the candidate arrays additionally carry
    the K_SEP margin-separated slots (ops/detect.py).
    """
    from rtl_sdr_scanner_tpu.ops.detect import K_SEP

    n_cand = top_k + K_SEP
    row = 3 * n_cand + 1 + 2 * key_slots
    body = packed[: frames * row].reshape(frames, row)
    cand_idx = body[:, :n_cand].astype(np.int32)
    cand_val = body[:, n_cand : 2 * n_cand]
    cand_best = body[:, 2 * n_cand : 3 * n_cand].astype(np.int32)
    cand_count = body[:, 3 * n_cand].astype(np.int32)
    key_val = body[:, 3 * n_cand + 1 : 3 * n_cand + 1 + key_slots]
    key_idx = body[:, 3 * n_cand + 1 + key_slots :].astype(np.int32)
    noise_ready = bool(packed[frames * row] > 0.5)
    return cand_idx, cand_val, cand_best, cand_count, key_val, key_idx, noise_ready


def _compact_scan_block(
    cfg: ScanConfig,
    group_size: int,
    top_k: int,
    state: ScanState,
    spectro_acc: jnp.ndarray,  # [spectro_size] f32 device-resident accumulator
    iq: jnp.ndarray,
    now_ms: jnp.ndarray,
    keys: jnp.ndarray,  # [S] i32 tracked keys (block start)
    valid_mask: jnp.ndarray,  # [fft] bool
    start_level: jnp.ndarray,  # scalar f32
    spectro_keep: jnp.ndarray,  # scalar f32 1.0=accumulate, 0.0=reset first
) -> Tuple[ScanState, jnp.ndarray, CompactScanOutputs]:
    from rtl_sdr_scanner_tpu.ops.averager import ordered_history
    from rtl_sdr_scanner_tpu.ops.detect import compact_detection

    power = _frames_power(cfg, iq)

    # newest (depth - depth//2 - 1) ring rows BEFORE this block feed the vote
    half_depth = cfg.grouping_y - cfg.grouping_y // 2
    prev_tail = ordered_history(state.averager)[-(half_depth - 1) :]

    noise_state, raw_rows = noise_block(state.noise, power, now_ms, cfg.noise_learning_ms)
    if cfg.power_bf16:
        # tolerance mode: rows are stored/voted in bf16 (ONE quantization);
        # sums/means/reported values remain f32 arithmetic over them
        raw_rows = raw_rows.astype(jnp.bfloat16)
    avg_state, mean_rows = averager_block(state.averager, raw_rows)
    state = ScanState(noise_state, avg_state)
    avg_rows = sliding_average(mean_rows, cfg.grouping_x)

    compact = compact_detection(
        avg_rows,
        raw_rows,
        prev_tail,
        keys,
        valid_mask,
        start_level,
        group_size,
        top_k,
        bf16=cfg.detection_bf16,
        pallas_select=cfg.use_pallas_select,
    )
    spectro_acc = spectro_acc * spectro_keep + accumulate_frames(power, cfg.spectro_size)
    f32 = lambda a: a.astype(jnp.float32)
    body = jnp.concatenate(
        [
            f32(compact.cand_idx),
            compact.cand_val,
            f32(compact.cand_best),
            f32(compact.cand_count)[:, None],
            compact.key_val,
            f32(compact.key_idx),
        ],
        axis=1,
    ).reshape(-1)
    packed = jnp.concatenate([body, f32(state.noise.ready)[None]])
    return state, spectro_acc, CompactScanOutputs(
        compact=compact,
        noise_ready=state.noise.ready,
        packed=packed,
    )


@functools.lru_cache(maxsize=16)
def make_compact_scan_step(cfg: ScanConfig, group_size: int, top_k: int = 64):
    """Jitted compact block step: (state, spectro_acc, iq, now, keys,
    valid_mask, start_level, spectro_keep)
    -> (state, spectro_acc, CompactScanOutputs)."""
    return jax.jit(
        functools.partial(_compact_scan_block, cfg, group_size, top_k),
        donate_argnums=(0, 1),
    )
