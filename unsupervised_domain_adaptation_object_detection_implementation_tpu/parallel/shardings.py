"""Parameter sharding rules (data + tensor parallel).

The reference has data parallelism only (SURVEY.md §2.7); here the detector
additionally supports a 2-D (data, model) mesh: the Shared2FC bbox head's
first FC — by far the largest parameter (7·7·2048×1024 ≈ 100M weights on the
DC5 trunk) — shards column-wise over the `model` axis, and its second FC
row-wise, so the pair needs a single psum on ICI (Megatron-style MLP split).
Everything else stays replicated: with XLA's sharding propagation that's the
entire "implementation" — rules + GSPMD, no manual collectives.

Placement is path-rule based: the SAME rule maps params, EMA params, and
every optimizer-state leaf whose path ends in a TP-split parameter name —
so SGD momentum shards exactly like its parameter (no replicated-momentum
HBM waste under TP, no silent fallback).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_keys(path) -> List[str]:
    """Flatten a tree_util key path into string segments (dict keys,
    NamedTuple field names, sequence indices)."""
    out = []
    for k in path:
        if hasattr(k, 'key'):
            out.append(str(k.key))
        elif hasattr(k, 'name'):
            out.append(str(k.name))
        elif hasattr(k, 'idx'):
            out.append(str(k.idx))
    return out


def _tp_spec(keys: List[str], leaf, model_axis: str) -> P:
    """Megatron split of the Shared2FC bbox-head pair. Matches any path
    SUFFIX `.../shared_fc{1,2}/{kernel,bias}` — the same parameter inside
    `params`, `ema_params`, or an optax momentum/trace tree."""
    shape = getattr(leaf, 'shape', ())
    if 'shared_fc1' in keys:
        if keys[-1] == 'kernel' and len(shape) == 2:
            return P(None, model_axis)    # column split
        if keys[-1] == 'bias' and len(shape) == 1:
            return P(model_axis)
    if 'shared_fc2' in keys and keys[-1] == 'kernel' and len(shape) == 2:
        return P(model_axis, None)        # row split
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh,
                    model_axis: str = 'model') -> Dict[str, Any]:
    """Sharding pytree for params: bbox-head FCs tensor-parallel, rest
    replicated. Works for any detector exposing `bbox_head/shared_fc{1,2}`."""

    def rule(path, leaf):
        return NamedSharding(mesh, _tp_spec(_path_keys(path), leaf,
                                            model_axis))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_train_state(state, mesh: Mesh, model_axis: str = 'model'):
    """Place a TrainState with TP rules applied uniformly to params, EMA
    params, AND the optimizer state (momentum shards like its parameter —
    optax trace trees carry the param path as a suffix, so the one rule
    covers them; MaskedNode / scalar leaves replicate)."""

    def place(path, leaf):
        spec = _tp_spec(_path_keys(path), leaf, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def fsdp_param_shardings(params: Dict[str, Any], mesh: Mesh,
                         data_axis: str = 'data',
                         min_weight_size: int = 2 ** 16) -> Dict[str, Any]:
    """ZeRO-3-style fully-sharded-parameter rules (beyond-reference bonus;
    SURVEY §2.7 'natural extension = pjit param sharding').

    Every parameter whose size ≥ `min_weight_size` and that has an axis
    divisible by the data-axis size shards that (largest divisible) axis
    over `data`; XLA/GSPMD inserts the all-gathers before use and
    reduce-scatters for the grads — the memory/communication pattern of
    FSDP with zero manual collectives. Small params stay replicated.
    """
    n_shards = mesh.shape[data_axis]

    def rule(_, leaf):
        shape = getattr(leaf, 'shape', ())
        if leaf is None or not shape:
            return NamedSharding(mesh, P())
        size = 1
        for d in shape:
            size *= d
        if size < min_weight_size:
            return NamedSharding(mesh, P())
        # largest axis divisible by the shard count
        cands = [(d, i) for i, d in enumerate(shape) if d % n_shards == 0]
        if not cands:
            return NamedSharding(mesh, P())
        _, ax = max(cands)
        spec = [None] * len(shape)
        spec[ax] = data_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)
