"""Wideband concurrent-band scanner.

The reference time-multiplexes spectrum wider than one sample-rate with
500 ms dwells (scanner.cpp:46-60) and therefore MISSES transmissions on the
ranges it is not currently watching. This mode watches everything at once:
one wideband front-end (or capture) is split by the polyphase channelizer
(ops/channelizer.py) into B sub-bands, each driven through its own full
detection/recording session concurrently -- the SURVEY.md north star
("one pod scans many bands concurrently instead of time-multiplexing").

Enable with `"channels": B` on a device config entry. Each sub-band behaves
exactly like a parked single-range scanner: its own noise floor, tracker,
recorder slots, spectrogram container, and egress (payload start/stop mark
the sub-band). All sessions share the same jitted pipelines (same geometry),
so compilation cost is paid once.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from rtl_sdr_scanner_tpu.ops.channelizer import (
    channel_center_offsets,
    channelize_block_pairs,
    init_channelizer_state,
    plan_channelizer,
)
from rtl_sdr_scanner_tpu.runtime.config import Config, DeviceSpec
from rtl_sdr_scanner_tpu.runtime.sdr_device import SdrDevice
from rtl_sdr_scanner_tpu.runtime.sources import make_source
from rtl_sdr_scanner_tpu.utils import logger
from rtl_sdr_scanner_tpu.utils.radio_utils import format_frequency

LABEL = "wideband"


class _PackedOuts:
    """Minimal stand-in for CompactScanOutputs when the banded mesh step's
    packed rows are distributed to per-band sessions (finish_block only
    reads .packed)."""

    def __init__(self, packed: np.ndarray):
        self.packed = packed


class WidebandScanner:
    def __init__(
        self,
        config: Config,
        device_spec: DeviceSpec,
        mqtt,
        recorders_count: int,
        loop_replay: bool = False,
    ):
        if device_spec.channels < 2:
            raise ValueError("wideband mode needs channels >= 2")
        if not device_spec.ranges:
            raise ValueError("wideband mode needs a frequency range")
        b = device_spec.channels
        rate = device_spec.sample_rate
        if rate % b != 0:
            raise ValueError(f"sample_rate {rate} not divisible by channels {b}")

        self._config = config
        self._source = make_source(device_spec, loop=loop_replay, tunables=config.tunables)
        self._oversample = 2 if config.tunables.channelizer_oversample == 2 else 1
        self._plan = plan_channelizer(b, oversample=self._oversample)
        if self._oversample == 2:
            from rtl_sdr_scanner_tpu.ops.channelizer import init_channelizer2x_state

            self._chan_state = init_channelizer2x_state(self._plan)
        else:
            self._chan_state = init_channelizer_state(self._plan)
        core = rate // b  # each channel OWNS an R/B-wide core range
        sub_rate = core * self._oversample  # stream rate (2R/B when oversampled)
        center = (device_spec.ranges[0][0] + device_spec.ranges[0][1]) // 2
        self._center = center
        offsets = channel_center_offsets(self._plan, rate)

        per_band_recorders = max(1, recorders_count // b)
        self._sessions: List[SdrDevice] = []
        self._offsets = offsets
        for ch in range(b):
            sub_center = center + int(offsets[ch])
            # ranges stay the CORE (R/B) even when the stream is 2R/B wide:
            # is_index_in_range gates detection to the core, so every
            # frequency is owned by exactly one session (edge dedup)
            sub_spec = dataclasses.replace(
                device_spec,
                sample_rate=sub_rate,
                ranges=[(sub_center - core // 2, sub_center + core // 2)],
                channels=0,
            )
            session = SdrDevice(config, sub_spec, mqtt, per_band_recorders)
            session.set_frequency_range(sub_spec.ranges[0], now_ms=0)
            self._sessions.append(session)
            logger.info(
                LABEL,
                "channel {}: {} - {} ({} sps)",
                ch,
                format_frequency(sub_spec.ranges[0][0]),
                format_frequency(sub_spec.ranges[0][1]),
                sub_rate,
            )

        # all sessions share geometry; wideband block = B * sub-band block
        # (halved when oversampled: each input sample yields 2/B outputs
        # per channel)
        self._sub_block = self._sessions[0].scan_cfg.block_samples
        self._wide_block = self._sub_block * b // self._oversample
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._mesh = None
        if config.tunables.mesh_bands:
            self._setup_mesh(config.tunables.mesh_bands)
        logger.info(
            LABEL,
            "watching {} concurrently as {} channels (block {} samples)",
            format_frequency(device_spec.ranges[0][1] - device_spec.ranges[0][0]),
            b,
            self._wide_block,
        )

    # -- multi-chip mode (SURVEY.md section 2 parallelism: bands mesh axis) --

    def _setup_mesh(self, mesh_bands: int) -> None:
        """Shard the B sub-band sessions over an N-device bands mesh: ONE
        sharded compact scan dispatch per wideband block replaces B serial
        session dispatches; trackers/recorders/egress stay per-band on host.
        """
        import jax

        from rtl_sdr_scanner_tpu.parallel.mesh import band_sharding, make_mesh
        from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
            init_banded_state,
            make_sharded_compact_step,
        )

        b = len(self._sessions)
        n = len(jax.devices()) if mesh_bands < 0 else mesh_bands
        n = min(n, len(jax.devices()), b)
        while b % n != 0:  # bands shard must divide evenly
            n -= 1
        if not self._config.tunables.compact_detection:
            logger.warn(LABEL, "mesh_bands needs compact detection; staying serial")
            return
        session = self._sessions[0]
        cfg = session.scan_cfg
        self._mesh = make_mesh(n_bands=n, n_time=1)
        self._mesh_step = make_sharded_compact_step(
            cfg,
            session._group_size_early,
            self._config.tunables.detection_top_k,
            self._mesh,
        )
        self._band_state = init_banded_state(cfg, b, self._mesh)
        self._band_acc = jax.device_put(
            jnp.zeros((b, cfg.spectro_size), dtype=jnp.float32),
            band_sharding(self._mesh),
        )
        # parked sessions: ranges never change, so masks are computed once
        self._band_valid = jax.device_put(
            jnp.stack(
                [jnp.asarray(s._tracker._compute_valid_mask()) for s in self._sessions]
            ),
            band_sharding(self._mesh),
        )
        self._acc_pending_frames = 0
        self._acc_reset_pending = False
        self._last_spectro_ms = 0
        logger.info(LABEL, "bands mesh: {} sub-bands over {} devices", b, n)

    def _step_mesh(self, channels, start_ms: int, now_ms: int) -> None:
        import jax

        cfg = self._sessions[0].scan_cfg
        b = len(self._sessions)
        s = self._config.tunables.detection_key_slots
        frame_ms = cfg.frame_interval_ms
        now_arr = (
            start_ms + ((1 + np.arange(cfg.frames_per_block)) * frame_ms)
        ).astype(np.int32)
        keys = np.stack(
            [session._tracker.current_keys(s) for session in self._sessions]
        )
        keep = 0.0 if self._acc_reset_pending else 1.0
        self._acc_reset_pending = False

        iq = channels.reshape(b, cfg.frames_per_block, -1, 2)
        self._band_state, self._band_acc, outs = self._mesh_step(
            self._band_state,
            self._band_acc,
            iq,
            jnp.broadcast_to(jnp.asarray(now_arr), (b, cfg.frames_per_block)),
            jnp.asarray(keys),
            self._band_valid,
            jnp.float32(self._sessions[0]._device.start_level),
            jnp.float32(keep),
        )
        self._acc_pending_frames += cfg.frames_per_block
        packed = np.asarray(outs.packed)  # ONE [B, L] device->host transfer
        for ch, session in enumerate(self._sessions):
            session.finish_block(
                {
                    "outs": _PackedOuts(packed[ch]),
                    "iq_dev": channels[ch],
                    "iq_is_int8": False,
                    "now_arr": now_arr,
                    "slot_keys": keys[ch],
                    "block_start_ms": start_ms,
                    "skip_spectro": True,
                }
            )
        interval = self._config.tunables.spectrogram_send_interval_ms
        if self._last_spectro_ms + interval < now_ms and self._acc_pending_frames:
            acc = np.asarray(self._band_acc, dtype=np.float64)
            for ch, session in enumerate(self._sessions):
                session.ingest_spectro(acc[ch], self._acc_pending_frames, now_ms)
            self._acc_pending_frames = 0
            self._acc_reset_pending = True
            self._last_spectro_ms = now_ms

    @property
    def sessions(self) -> List[SdrDevice]:
        return self._sessions

    def manual_record(self, frequency: int, duration_ms: int) -> bool:
        """Route a manual recording to the sub-band session covering it."""
        for session in self._sessions:
            lo, hi = session._frequency_range
            if lo <= frequency <= hi:
                session.request_manual_recording(frequency, duration_ms)
                return True
        return False

    def step(self) -> bool:
        block = self._source.read_block(self._wide_block)
        if block is None:
            return False
        now_ms = self._source.stream_time_ms()
        start_ms = int(now_ms - self._wide_block * 1000 / self._source.sample_rate)
        pairs = np.ascontiguousarray(block, dtype=np.complex64).view(np.float32)
        if self._oversample == 2:
            from rtl_sdr_scanner_tpu.ops.channelizer import channelize_block_2x_pairs

            self._chan_state, channels = channelize_block_2x_pairs(
                self._plan, self._chan_state, jnp.asarray(pairs.reshape(-1, 2))
            )
        else:
            self._chan_state, channels = channelize_block_pairs(
                self._plan, self._chan_state, jnp.asarray(pairs.reshape(-1, 2))
            )
        if self._mesh is not None:
            # multi-chip: one sharded banded dispatch for ALL sub-bands
            self._step_mesh(channels, start_ms, now_ms)
            return True
        # per-band sessions consume their channel stream ON DEVICE (no host
        # round trip); submit all bands first so the device pipelines
        # overlap, then finish
        handles = []
        for ch, session in enumerate(self._sessions):
            handles.append(session.submit_block(channels[ch], start_ms))
        for session, handle in zip(self._sessions, handles):
            session.finish_block(handle)
        return True

    def run_to_completion(self) -> None:
        while self.step():
            pass

    def start(self) -> None:
        self._running = True

        def worker():
            logger.info(LABEL, "thread started")
            while self._running:
                if not self.step():
                    break
            logger.info(LABEL, "thread stopped")

        self._thread = threading.Thread(target=worker, name="wideband", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        # release the hardware like Scanner.stop (SdrDevice dtor parity,
        # sdr_device.cpp:47-52)
        if hasattr(self._source, "stop_streaming"):
            self._source.stop_streaming()
        if hasattr(self._source, "close"):
            self._source.close()
