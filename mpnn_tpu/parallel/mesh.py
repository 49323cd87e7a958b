"""Device-mesh helpers.

The reference has zero distributed code (SURVEY.md §2.6); scaling here is
greenfield and idiomatic JAX: a named Mesh over ICI/DCN, NamedShardings for
data parallelism (XLA inserts the gradient psums), and shard_map for the
edge-partitioned message passing (parallel/edge_partition.py).

Axis conventions:
  "data"  — graphs / batches (DP)
  "edge"  — edge partition inside a graph batch (the sequence-parallel
            analog for graphs)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, edge: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // edge
    assert data * edge == n, f"{data}×{edge} != {n} devices"
    arr = np.asarray(devices).reshape(data, edge)
    return Mesh(arr, ("data", "edge"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, leading_axis: bool = True) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place every array of a batch dict with its leading axis split over
    the 'data' mesh axis (graphs for dense batches; device-stacked packed
    batches for the packed path)."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) if hasattr(v, "shape") and v.ndim >= 1
            else v for k, v in batch.items()}


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Multi-host bring-up over DCN — see parallel/multihost.py (tested by
    tests/test_multihost.py with two real processes)."""
    from mpnn_tpu.parallel.multihost import multihost_init as _init
    _init(coordinator, num_processes, process_id)
