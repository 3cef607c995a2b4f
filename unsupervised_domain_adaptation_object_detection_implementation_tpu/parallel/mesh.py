"""Device mesh + sharding helpers.

Replaces the reference's entire distributed stack — `init_dist`/NCCL process
groups, `MMDistributedDataParallel` gradient buckets, `DistributedGroupSampler`
(`apis/train.py:113-124`, `datasets/builder.py:160-161`; SURVEY.md §2.7) —
with `jax.sharding`: one 1-D `data` mesh axis, batch sharded on it, params
replicated. XLA schedules the gradient all-reduce over ICI; there is no
backend management code to write.

Two-stream note: batches arrive interleaved [s, t, s, t, ...] (see
`data/samplers/two_stream.py`), so an even per-chip batch always carries
equal source/target rows — the DA losses stay balanced per chip.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = 'data',
              model: int = 1) -> Mesh:
    """1-D `data` mesh, or a 2-D (data, model) mesh when `model > 1`.

    `model` is the tensor-parallel degree (see `shardings.param_shardings`);
    devices are laid out model-axis-minor so TP pairs are ICI neighbors.
    Config surface: `mesh = dict(data=-1, model=2)` (data=-1 → fill).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % model:
        raise ValueError(
            f'{len(devices)} devices not divisible by model={model}')
    grid = np.asarray(devices).reshape(len(devices) // model, model)
    return Mesh(grid, (axis_name, 'model'))


def mesh_from_cfg(cfg, n_devices: Optional[int] = None) -> Mesh:
    """Build the mesh from a config's `mesh = dict(data=-1, model=1)` block
    (the TPU-native analogue of the reference's `dist_params`
    `da_configs/_base_/default_runtime.py:24`)."""
    mesh_cfg = (cfg.get('mesh') if hasattr(cfg, 'get') else None) or {}
    model = int(mesh_cfg.get('model', 1))
    data = int(mesh_cfg.get('data', -1))
    if data > 0 and n_devices is None:
        n_devices = data * model
    return make_mesh(n_devices, model=model)


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                axis_name: str = 'data') -> Dict[str, jax.Array]:
    """Host batch dict → device arrays sharded along the batch axis."""
    sharding = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Place a TrainState/pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), state)
