"""Device mesh construction.

Greenfield (SURVEY §2.5): the reference has no parallelism of any kind;
the TPU framework scales via ``jax.sharding.Mesh`` with named axes
('data', 'model', 'seq') and XLA collectives over ICI — the TPU-native
equivalent of a NCCL backend.  ``jax.distributed.initialize`` handles
multi-host slices; single-process multi-device needs no init.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

MeshAxes = ("data", "model", "seq", "expert")


def make_mesh(data: int = 1, model: int = 1, seq: int = 1,
              expert: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A (data, model, seq, expert) mesh over the first
    data*model*seq*expert devices.

    On real slices, device order follows jax.devices() which XLA lays
    out so that adjacent mesh coordinates ride ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = data * model * seq * expert
    if len(devices) < n:
        raise ValueError(
            f"mesh {data}x{model}x{seq}x{expert} needs {n} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:n], dtype=object).reshape(
        data, model, seq, expert)
    return Mesh(arr, MeshAxes)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (jax.distributed) for real TPU slices; no-op in
    single-process environments."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
