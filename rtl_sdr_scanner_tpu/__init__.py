"""TPU-native SDR spectrum scanner framework.

A ground-up re-design of the capabilities of shajen/rtl-sdr-scanner-cpp
(reference mounted at /root/reference) for TPU hardware:

- The streaming DSP chain (window -> FFT -> PSD -> noise floor -> time/freq
  averaging -> threshold detection -> per-detection DDC) runs as fused
  JAX/XLA/Pallas programs over batched IQ time-blocks
  (reference: GNU Radio flowgraph, sources/radio/blocks/*).
- The host runtime (config, band-hop scheduling, signal lifecycle, recorder
  slot reconciliation, MQTT egress) mirrors the reference's L4-L6 layers
  (sources/scanner.cpp, sources/radio/sdr_device.cpp, sources/network/*).
- Multi-chip scaling shards frequency bands and time-blocks over a
  jax.sharding.Mesh; overlap-save halos ride ICI collectives.

Layout:
  ops/       pure-JAX + Pallas DSP kernels (device compute path)
  models/    assembled jitted pipelines (scan step, DDC recorder bank)
  parallel/  mesh construction, shard_map pipelines, halo exchange
  runtime/   host-side application runtime (config, scheduler, egress)
  utils/     host math/domain helpers (golden-tested vs reference)
  native/    C++ acceleration for host hot paths (codec, IQ loading)
"""

__version__ = "0.1.0"

from rtl_sdr_scanner_tpu import constants  # noqa: F401
