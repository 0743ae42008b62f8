"""Device-mesh construction and multi-host bootstrap (SURVEY.md §3.4, §5).

The reference has no library init (per-command state, single process); the
TPU build's init is explicit and idempotent: `jax.distributed.initialize()`
for multi-process bootstrap, then a named `jax.sharding.Mesh` whose axes the
rest of the package programs against:

  * ``db``   — the genome axis of the sketch database (the "weights" of this
               workload; TP-analog in SURVEY.md §2's parallelism table).
  * ``data`` — read batches streamed data-parallel (DP).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DB_AXIS = "db"
DATA_AXIS = "data"

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent multi-process bootstrap.

    No-op when running single-process (the common test / 1-host case) unless
    coordinator info is supplied explicitly or via the standard JAX env vars.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    has_env = bool(coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not has_env:
        return  # single process; jax.process_count() == 1 already
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True


def local_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DB_AXIS,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A named mesh over the available devices.

    Default: a 1-D ``(db,)`` mesh over all devices.  Pass
    ``shape=(n_data, n_db), axis_names=("data", "db")`` for the 2-D layout
    used when screening and all-vs-all share a pod slice.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    if len(shape) != len(tuple(axis_names)):
        raise ValueError(f"shape {shape} vs axis_names {tuple(axis_names)}")
    arr = np.asarray(devices, dtype=object).reshape(shape)
    return Mesh(arr, tuple(axis_names))
