"""Multi-host (DCN) initialization and per-host data feeding.

Replaces the reference's launcher zoo — `init_dist` with
pytorch/slurm/mpi launchers and NCCL process groups (`tools/DA_train.py:
66-70,214`, `da_configs/_base_/default_runtime.py:24`) — with
`jax.distributed.initialize` (one call; ICI within a slice and DCN across
slices are handled by the runtime) plus
`jax.make_array_from_process_local_data` for per-host input pipelines.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize the multi-process runtime (no-op single-process).

    Environment-driven by default (JAX_COORDINATOR_ADDRESS etc. or cloud TPU
    metadata); explicit args for manual launchers. Returns process index.
    """
    if num_processes is None:
        num_processes = int(os.environ.get('JAX_NUM_PROCESSES', '1'))
    if num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index()


def global_batch_from_host_data(batch: Dict[str, np.ndarray], mesh,
                                axis_name: str = 'data'):
    """Assemble a globally-sharded batch from per-host shards.

    Each host's input pipeline produces its local rows; this stitches them
    into global jax.Arrays sharded over the mesh data axis (the reference's
    `DistributedSampler` + scatter equivalent).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
