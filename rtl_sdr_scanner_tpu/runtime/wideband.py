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
        # set when the worker thread dies on a fatal error; main exits on it
        self.failed = False
        self._source = make_source(device_spec, loop=loop_replay, tunables=config.tunables)
        self._oversample = 2 if config.tunables.channelizer_oversample == 2 else 1
        self._plan = plan_channelizer(
            b,
            oversample=self._oversample,
            bf16=config.tunables.channelizer_bf16,
        )
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
        self._noise_path = (
            f"{config.tunables.noise_state_path}.{device_spec.name}"
            if config.tunables.noise_state_path
            else None
        )
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
            if self._noise_path:
                import os

                path = f"{self._noise_path}.ch{ch}.npz"
                if os.path.exists(path):
                    session.load_noise_state(path)
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
        self._int8_ingest = config.tunables.int8_ingest
        # pipelined mesh ingest: one wideband block in flight on the mesh
        # while the host consumes the previous block's packed rows (same
        # contract as SdrDevice.submit_block: keys sampled at submit time)
        self._pipelined = config.tunables.pipelined_ingest
        self._mesh_inflight: Optional[tuple] = None
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
        sharded channelize+scan dispatch per wideband block (the polyphase
        bank runs INSIDE the mesh program, parallel/sharded_scan.py
        make_sharded_wideband_step) plus, when any band records, ONE banded
        DDC dispatch for ALL bands (make_sharded_banded_ddc) -- the reference
        runs its recorder chains concurrently off one source
        (sdr_device.cpp:39-41); B serial per-band dispatches would not scale.
        Trackers/recorders/egress stay per-band on host.
        """
        import jax

        from rtl_sdr_scanner_tpu.parallel.mesh import band_sharding, make_mesh, replicated
        from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
            init_banded_ddc_state,
            init_banded_state,
            make_sharded_banded_ddc,
            make_sharded_wideband_step,
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
        self._wide_step = make_sharded_wideband_step(
            cfg,
            session._group_size_early,
            self._config.tunables.detection_top_k,
            self._mesh,
            self._plan,
            self._oversample,
            b,
        )
        self._band_state = init_banded_state(cfg, b, self._mesh)
        self._chan_state = jax.device_put(self._chan_state, replicated(self._mesh))
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

        # multi-host (tunables.multihost + jax.distributed): the mesh spans
        # every process's devices; THIS process feeds/publishes only the
        # bands whose devices it owns (parallel/multihost.py placement). In
        # a single process that is simply all bands.
        self._multihost = jax.process_count() > 1
        me = jax.process_index()
        grid = self._mesh.devices.reshape(-1)
        bands_per_dev = b // n
        self._local_bands = [
            band
            for d in range(n)
            if grid[d].process_index == me
            for band in range(d * bands_per_dev, (d + 1) * bands_per_dev)
        ]
        if self._multihost:
            logger.info(
                LABEL,
                "multihost process {}/{}: feeding bands {}",
                me,
                jax.process_count(),
                self._local_bands,
            )

        # banded recording: one K*B-slot DDC program (modulated-taps chains
        # only -- every production rate; exotic chains keep per-band DDC)
        self._ddc_cfg = session.ddc_cfg
        self._fused = False
        if self._ddc_cfg.modtap:
            self._band_shifts = np.zeros((b, self._ddc_cfg.num_slots), dtype=np.int64)
            self._band_tables = self._build_band_tables()
            self._ddc_band_state = init_banded_ddc_state(self._ddc_cfg, b, self._mesh)
            if self._config.tunables.wideband_fused_dispatch:
                # ONE dispatch per block: channelize + scan + banded DDC
                # (round-4 verdict weak #2). Slot reconcile applies from the
                # NEXT block -- reference notification timing
                # (recorder.cpp:58-73); the split default records the
                # triggering block itself and stays byte-identical to serial.
                from rtl_sdr_scanner_tpu.parallel.sharded_scan import (
                    make_sharded_wideband_fused_step,
                )

                self._fused = True
                self._ddc_band_step = None
                self._fused_step = make_sharded_wideband_fused_step(
                    cfg,
                    self._ddc_cfg,
                    session._group_size_early,
                    self._config.tunables.detection_top_k,
                    self._mesh,
                    self._plan,
                    self._oversample,
                    b,
                )
            else:
                self._ddc_band_step = make_sharded_banded_ddc(
                    self._ddc_cfg, self._mesh, b
                )
            for s_ in self._sessions:
                s_.external_ddc = True
        else:
            self._ddc_band_step = None
            if self._multihost:
                raise ValueError("multihost wideband needs the modulated-taps chain")
            if self._config.tunables.wideband_fused_dispatch:
                logger.warn(
                    LABEL, "wideband_fused_dispatch needs the modulated-taps chain"
                )
            logger.warn(LABEL, "non-modtap DDC chain: recording stays per-band")
        logger.info(
            LABEL,
            "bands mesh: {} sub-bands over {} devices{}",
            b,
            n,
            " (fused single dispatch)" if self._fused else "",
        )

    @staticmethod
    def _fetch_band_rows(arr) -> dict:
        """This process's band rows of a bands-sharded array, fetched shard
        by shard (a multi-host array is not fully addressable; on one process
        with one device this is the same single d2h transfer as before)."""
        rows = {}
        for shard in arr.addressable_shards:
            lo = shard.index[0].start or 0
            data = np.asarray(shard.data)
            for off in range(data.shape[0]):
                rows[lo + off] = data[off]
        return rows

    def _build_band_tables(self):
        """Stack per-band DDC tables (host-exact math) with bands sharding.
        Rebuilt only when some band's recorder slots changed -- rare,
        human-timescale events (recorder start/stop). Assembled per shard via
        make_array_from_callback: under multihost each process only KNOWS its
        own bands' shifts, so the global array must be built from each
        owner's local values (device_put would reject differing host values).
        """
        import jax

        from rtl_sdr_scanner_tpu.models import ddc_pipeline
        from rtl_sdr_scanner_tpu.parallel.mesh import band_sharding

        per_band = [
            ddc_pipeline.make_tables(self._ddc_cfg, self._band_shifts[ch])
            for ch in range(len(self._sessions))
        ]
        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *per_band
        )
        sharding = band_sharding(self._mesh)
        return jax.tree.map(
            lambda a: jax.make_array_from_callback(
                a.shape, sharding, lambda idx, a=a: a[idx]
            ),
            stacked,
        )

    def _step_mesh(self, pairs: np.ndarray, start_ms: int, now_ms: int) -> None:
        handle = self._submit_mesh(pairs, start_ms)
        if not self._pipelined:
            self._finish_mesh(handle, now_ms)
            return
        if self._mesh_inflight is not None:
            prev_handle, prev_now = self._mesh_inflight
            self._finish_mesh(prev_handle, prev_now)
        self._mesh_inflight = (handle, now_ms)

    def _drain_mesh(self) -> None:
        if self._mesh_inflight is not None:
            handle, now_ms = self._mesh_inflight
            self._mesh_inflight = None
            self._finish_mesh(handle, now_ms)

    def _submit_mesh(self, pairs: np.ndarray, start_ms: int) -> dict:
        """Dispatch one wideband block without waiting: ONE sharded program
        covers in-mesh channelization + all bands' compact scan."""
        cfg = self._sessions[0].scan_cfg
        s = self._config.tunables.detection_key_slots
        frame_ms = cfg.frame_interval_ms
        now_arr = (
            start_ms + ((1 + np.arange(cfg.frames_per_block)) * frame_ms)
        ).astype(np.int32)
        # non-local rows are dead weight: each process materializes only its
        # own shards of a sharded input, so the owner's values are the ones
        # that reach the devices
        keys = np.stack(
            [session._tracker.current_keys(s) for session in self._sessions]
        )
        keep = 0.0 if self._acc_reset_pending else 1.0
        self._acc_reset_pending = False

        if self._fused:
            # reconcile BEFORE the dispatch: slot events drained here came
            # from the PREVIOUS block's host processing, so this block's DDC
            # runs with tables/keeps that are already correct for it
            # (reference notification timing, recorder.cpp:58-73)
            keep_mask = np.ones(
                (len(self._sessions), self._ddc_cfg.num_slots), np.float32
            )
            dirty = False
            for ch in self._local_bands:
                for slot, shift, started in self._sessions[ch].drain_slot_events():
                    if started:
                        keep_mask[ch, slot] = 0.0
                    self._band_shifts[ch, slot] = shift
                    dirty = True
            if dirty:
                self._band_tables = self._build_band_tables()
            # slots recording as of THIS dispatch: only their rows are valid
            # in this block's DDC output (a slot started during this block's
            # host processing gets its first valid rows next block)
            active_slots = {
                ch: self._sessions[ch].recording_slot_indices()
                for ch in self._local_bands
            }
            (
                self._chan_state,
                self._band_state,
                self._band_acc,
                self._ddc_band_state,
                packed_dev,
                rec_dev,
                channels,
            ) = self._fused_step(
                self._chan_state,
                self._band_state,
                self._band_acc,
                self._ddc_band_state,
                pairs,
                now_arr,
                keys,
                self._band_valid,
                jnp.float32(self._sessions[0]._device.start_level),
                jnp.float32(keep),
                self._band_tables,
                keep_mask,
            )
            self._acc_pending_frames += cfg.frames_per_block
            return {
                "packed_dev": packed_dev,
                "channels": channels,
                "rec_dev": rec_dev,
                "active_slots": active_slots,
                "now_arr": now_arr,
                "keys": keys,
                "start_ms": start_ms,
            }

        (
            self._chan_state,
            self._band_state,
            self._band_acc,
            packed_dev,
            channels,
        ) = self._wide_step(
            self._chan_state,
            self._band_state,
            self._band_acc,
            pairs,  # uncommitted: jit shards it per in_specs on every process
            now_arr,
            keys,
            self._band_valid,
            jnp.float32(self._sessions[0]._device.start_level),
            jnp.float32(keep),
        )
        self._acc_pending_frames += cfg.frames_per_block
        return {
            "packed_dev": packed_dev,
            "channels": channels,
            "now_arr": now_arr,
            "keys": keys,
            "start_ms": start_ms,
        }

    def _finish_mesh(self, handle: dict, now_ms: int) -> None:
        channels = handle["channels"]
        now_arr = handle["now_arr"]
        keys = handle["keys"]
        start_ms = handle["start_ms"]
        packed = self._fetch_band_rows(handle["packed_dev"])
        for ch in self._local_bands:
            session = self._sessions[ch]
            # banded-DDC mode skips per-session DDC (slot recording runs as
            # ONE sharded dispatch below), so iq_dev is normally dead weight
            # (each channels[ch] index is a device dispatch) -- EXCEPT when
            # the debug raw-IQ sink is live, which consumes iq_dev directly
            # (round-3 advisor: the sink silently produced empty captures)
            feed_sink = session.wants_raw_iq()
            banded_ddc = self._fused or self._ddc_band_step is not None
            session.finish_block(
                {
                    "outs": _PackedOuts(packed[ch]),
                    "iq_dev": channels[ch]
                    if (not banded_ddc or feed_sink)
                    else None,
                    "iq_is_int8": False,
                    "now_arr": now_arr,
                    "slot_keys": keys[ch],
                    "block_start_ms": start_ms,
                    "skip_spectro": True,
                    "skip_ddc": banded_ddc,
                }
            )

        if self._fused:
            # the DDC already ran inside the submit dispatch; ingest rows for
            # the slots that were recording at dispatch time. Slots started
            # since (during this block's host processing) get their first
            # valid rows next block -- clear their in-block start trim now
            # so that block is not wrongly trimmed.
            active_slots = handle["active_slots"]
            fetch = any(active_slots.get(ch) for ch in self._local_bands)
            rec = self._fetch_band_rows(handle["rec_dev"]) if fetch else None
            for ch in self._local_bands:
                session = self._sessions[ch]
                started_since = (
                    session.recording_slot_indices() - active_slots.get(ch, set())
                )
                if started_since:
                    session.clear_slot_start_trim(started_since)
                if rec is not None and session.is_recording:
                    session.ingest_ddc_out(
                        rec[ch], start_ms, only_slots=active_slots.get(ch, set())
                    )
        elif self._ddc_band_step is not None:
            # reconcile the banded DDC slots from the sessions' slot events,
            # then run recording as ONE sharded dispatch over the bands axis.
            # Slot resets ride the keep mask so the dispatch itself is
            # identical on every process (multi-host SPMD requirement).
            keep_mask = np.ones((len(self._sessions), self._ddc_cfg.num_slots), np.float32)
            dirty = False
            for ch in self._local_bands:
                for slot, shift, started in self._sessions[ch].drain_slot_events():
                    if started:
                        keep_mask[ch, slot] = 0.0
                    self._band_shifts[ch, slot] = shift
                    dirty = True
            if dirty:
                self._band_tables = self._build_band_tables()
            # single process skips the dispatch while nothing records; under
            # multihost every process must issue the same dispatches, so the
            # DDC runs every block (its output is discarded when idle)
            recording = any(self._sessions[ch].is_recording for ch in self._local_bands)
            if recording or self._multihost:
                self._ddc_band_state, rec_dev = self._ddc_band_step(
                    self._ddc_band_state, channels, self._band_tables, keep_mask
                )
                if recording:
                    rec = self._fetch_band_rows(rec_dev)
                    for ch in self._local_bands:
                        if self._sessions[ch].is_recording:
                            self._sessions[ch].ingest_ddc_out(rec[ch], start_ms)
        # (non-modtap fallback: finish_block above ran each recording band's
        # own _ddc_step because skip_ddc was False and iq_dev was its stream)

        interval = self._config.tunables.spectrogram_send_interval_ms
        if self._last_spectro_ms + interval < now_ms and self._acc_pending_frames:
            acc = self._fetch_band_rows(self._band_acc)
            for ch in self._local_bands:
                self._sessions[ch].ingest_spectro(
                    acc[ch].astype(np.float64), self._acc_pending_frames, now_ms
                )
            self._acc_pending_frames = 0
            self._acc_reset_pending = True
            self._last_spectro_ms = now_ms

    @property
    def sessions(self) -> List[SdrDevice]:
        return self._sessions

    def manual_record(self, frequency: int, duration_ms: int) -> bool:
        """Route a manual recording to the sub-band session covering it.

        Under multihost every process receives the MQTT request; only the
        process that OWNS the covering band arms it (its sessions are the
        only ones fed), so exactly one recording happens."""
        local = (
            self._local_bands if self._mesh is not None else range(len(self._sessions))
        )
        for ch in local:
            session = self._sessions[ch]
            lo, hi = session._frequency_range
            if lo <= frequency <= hi:
                session.request_manual_recording(frequency, duration_ms)
                return True
        return False

    def _read_pairs(self) -> Optional[np.ndarray]:
        """Next wideband block as [n, 2] pairs: int8 cs8 when the source
        offers it (quarter h2d bandwidth; the channelizer dequantizes in-jit)
        else f32."""
        if self._int8_ingest and hasattr(self._source, "read_block_int8"):
            raw = self._source.read_block_int8(self._wide_block)
            if raw is not None:
                return raw
        block = self._source.read_block(self._wide_block)
        if block is None:
            return None
        pairs = np.ascontiguousarray(block, dtype=np.complex64).view(np.float32)
        return pairs.reshape(-1, 2)

    def step(self) -> bool:
        pairs = self._read_pairs()
        if pairs is None:
            if self._mesh is not None:
                self._drain_mesh()  # consume the pipelined tail block
            return False
        now_ms = self._source.stream_time_ms()
        start_ms = int(now_ms - self._wide_block * 1000 / self._source.sample_rate)
        if self._mesh is not None:
            # multi-chip: the channelizer runs INSIDE the sharded program --
            # one dispatch covers ingest + all sub-bands' detection
            self._step_mesh(pairs, start_ms, now_ms)
            return True
        if self._oversample == 2:
            from rtl_sdr_scanner_tpu.ops.channelizer import channelize_block_2x_pairs

            self._chan_state, channels = channelize_block_2x_pairs(
                self._plan, self._chan_state, jnp.asarray(pairs)
            )
        else:
            self._chan_state, channels = channelize_block_pairs(
                self._plan, self._chan_state, jnp.asarray(pairs)
            )
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
            try:
                while self._running:
                    if not self.step():
                        break
            except Exception as exc:
                # fatal error: mark failed so main exits (reference exit(1)
                # parity, sdr_source.cpp:38-41); never die silently
                self.failed = True
                logger.error(LABEL, "wideband scanner thread failed: {}", exc)
            logger.info(LABEL, "thread stopped")

        self._thread = threading.Thread(target=worker, name="wideband", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self._drain_mesh()
        # release the hardware like Scanner.stop (SdrDevice dtor parity,
        # sdr_device.cpp:47-52)
        if hasattr(self._source, "stop_streaming"):
            self._source.stop_streaming()
        if hasattr(self._source, "close"):
            self._source.close()
        now_ms = self._source.stream_time_ms()
        # final spectrogram flush: in mesh mode the pending bin sums live in
        # the banded device accumulator -- fold them into the sessions first
        local = self._local_bands if self._mesh is not None else range(len(self._sessions))
        if self._mesh is not None and self._acc_pending_frames:
            acc = self._fetch_band_rows(self._band_acc)
            for ch in local:
                container = self._sessions[ch]._get_spectro_container(now_ms)
                container.sum += acc[ch].astype(np.float64)
                container.counter += self._acc_pending_frames
            self._acc_pending_frames = 0
            self._acc_reset_pending = True
        for ch in local:
            self._sessions[ch].flush_spectrogram(now_ms)
            if self._noise_path:
                self._sessions[ch].save_noise_state(f"{self._noise_path}.ch{ch}.npz")
