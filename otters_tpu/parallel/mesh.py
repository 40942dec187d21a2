"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (call once per process on a pod).

    After this, ``make_mesh`` sees every chip in the slice and sharded
    stores span hosts; collectives ride ICI within a slice and DCN across
    slices — XLA picks the transport from the mesh topology.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    rows: Optional[int] = None,
    batch: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('rows', 'batch') mesh.

    'rows'  : shards the vector/metadata row axis (the analog of the
              reference's chunk parallelism, scaled across chips).
    'batch' : shards the query batch (data parallel over queries).

    Defaults to all rows-parallel over every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if rows is None:
        rows = n // batch
    if rows * batch != n:
        raise ValueError(
            f"rows ({rows}) x batch ({batch}) must equal device count ({n})"
        )
    dev_array = np.asarray(devices).reshape(rows, batch)
    return Mesh(dev_array, axis_names=("rows", "batch"))
