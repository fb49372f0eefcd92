"""Multi-host scaling (DCN) helpers.

The reference is a single process; its only networking is MQTT to a broker.
The TPU framework scales past one host with jax.distributed: the same
(bands, time) mesh spans all hosts' devices. Placement policy (SURVEY.md
section 2 parallelism table):

- the "bands" axis maps across hosts (DCN): per-band pipelines exchange no
  data, so DCN carries nothing during steady state;
- the "time" axis stays within a host's slice (ICI): overlap-save halos
  (parallel/halo.py) are latency-sensitive neighbor exchanges.

Each host feeds the bands whose mesh coordinates it owns from its local SDR
front-ends / replay files (data-local ingest), and publishes to the shared
MQTT broker under its own device names -- the broker contract is unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from rtl_sdr_scanner_tpu.parallel.mesh import BANDS_AXIS, TIME_AXIS
from rtl_sdr_scanner_tpu.utils import logger

LABEL = "multihost"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed runtime (no-op for a single process).

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment contract -- the launch interface of the
    config-driven runtime (`tunables.multihost`, runtime/main.py): start the
    same config on every host with those three variables set.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        raw = os.environ.get("JAX_NUM_PROCESSES", "1")
        try:
            num_processes = int(raw)
        except ValueError:
            raise ValueError(
                f"JAX_NUM_PROCESSES must be an integer, got {raw!r}"
            ) from None
    if process_id is None and os.environ.get("JAX_PROCESS_ID") is not None:
        raw = os.environ["JAX_PROCESS_ID"]
        try:
            process_id = int(raw)
        except ValueError:
            raise ValueError(
                f"JAX_PROCESS_ID must be an integer, got {raw!r}"
            ) from None
    if num_processes is not None and num_processes > 1:
        # validate the env contract up front: jax.distributed.initialize
        # fails opaquely (or hangs) on a missing coordinator/process id
        if not coordinator_address:
            raise ValueError(
                "multihost launch requires JAX_COORDINATOR_ADDRESS "
                "(host:port of process 0) when JAX_NUM_PROCESSES > 1"
            )
        if process_id is None:
            raise ValueError(
                "multihost launch requires JAX_PROCESS_ID "
                "(0..JAX_NUM_PROCESSES-1) when JAX_NUM_PROCESSES > 1"
            )
        if not 0 <= process_id < num_processes:
            raise ValueError(
                f"JAX_PROCESS_ID {process_id} out of range for "
                f"JAX_NUM_PROCESSES {num_processes}"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            LABEL,
            "joined distributed runtime: process {}/{}",
            jax.process_index(),
            jax.process_count(),
        )


def make_global_mesh(n_time_per_host: int = 1) -> Mesh:
    """(bands, time) mesh over ALL processes' devices, with the time axis
    confined to contiguous (same-host, ICI-connected) device groups."""
    devices = np.array(jax.devices())
    n = len(devices)
    n_time = n_time_per_host
    if n % n_time != 0:
        n_time = 1
    return Mesh(devices.reshape(n // n_time, n_time), (BANDS_AXIS, TIME_AXIS))


def local_band_indices(mesh: Mesh) -> list:
    """Band coordinates whose first device is owned by this process -- the
    bands this host must feed with IQ."""
    mine = []
    grid = mesh.devices
    for b in range(grid.shape[0]):
        if grid[b, 0].process_index == jax.process_index():
            mine.append(b)
    return mine
