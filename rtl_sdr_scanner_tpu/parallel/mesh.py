"""Device mesh construction.

The reference time-multiplexes bands on one SDR thread (scanner.cpp:46-60)
and parallelizes devices with threads (main.cpp:50-63). The TPU-native answer
(SURVEY.md section 2 parallelism table) is a 2D mesh:

- axis "bands": frequency bands scanned CONCURRENTLY (the north-star upgrade
  over time-multiplexed hopping); embarrassingly parallel -- per-band carry
  state shards with the band.
- axis "time": IQ time-blocks of one band sharded across chips; FIR/DDC
  correctness across shard seams uses overlap-save halo exchange
  (parallel/halo.py) riding ICI collectives.

Multi-host: the same mesh spans hosts via jax.distributed; bands should map
to the DCN-facing axis (no halo traffic) and time to the ICI-facing axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BANDS_AXIS = "bands"
TIME_AXIS = "time"


def make_mesh(
    n_bands: Optional[int] = None,
    n_time: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2D (bands, time) mesh over available devices.

    Defaults to all devices on the bands axis (concurrent band scanning is
    the common case; time sharding is for single-band rates beyond one chip).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_bands is None:
        n_bands = len(devices) // n_time
    if n_bands * n_time > len(devices):
        raise ValueError(f"mesh {n_bands}x{n_time} exceeds {len(devices)} devices")
    grid = np.array(devices[: n_bands * n_time]).reshape(n_bands, n_time)
    return Mesh(grid, (BANDS_AXIS, TIME_AXIS))


def band_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis = band shard (state pytrees, IQ blocks, output rows)."""
    return NamedSharding(mesh, P(BANDS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
