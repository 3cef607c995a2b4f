"""Parameter sharding rules (data + tensor parallel).

The reference has data parallelism only (SURVEY.md §2.7); here the detector
additionally supports a 2-D (data, model) mesh: the Shared2FC bbox head's
first FC — by far the largest parameter (7·7·2048×1024 ≈ 100M weights on the
DC5 trunk) — shards column-wise over the `model` axis, and its second FC
row-wise, so the pair needs a single psum on ICI (Megatron-style MLP split).
Everything else stays replicated: with XLA's sharding propagation that's the
entire "implementation" — rules + GSPMD, no manual collectives.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(params: Dict[str, Any], mesh: Mesh,
                    model_axis: str = 'model') -> Dict[str, Any]:
    """Sharding pytree for params: bbox-head FCs tensor-parallel, rest
    replicated. Works for any detector exposing `bbox_head/shared_fc{1,2}`."""

    def rule(path, leaf):
        keys = [k.key for k in path if hasattr(k, 'key')]
        if 'shared_fc1' in keys and keys[-1] == 'kernel':
            return NamedSharding(mesh, P(None, model_axis))   # column split
        if 'shared_fc1' in keys and keys[-1] == 'bias':
            return NamedSharding(mesh, P(model_axis))
        if 'shared_fc2' in keys and keys[-1] == 'kernel':
            return NamedSharding(mesh, P(model_axis, None))   # row split
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_train_state(state, mesh: Mesh, model_axis: str = 'model'):
    """Place a TrainState with TP rules on params (+ matching opt state)."""
    p_shard = param_shardings(state.params, mesh, model_axis)

    def place_like(tree):
        # momentum/trace trees mirror params; other leaves replicate
        try:
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), tree, p_shard)
        except ValueError:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)

    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state.params, p_shard)
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        state.batch_stats)

    def place_opt(node):
        if isinstance(node, tuple):
            return tuple(place_opt(n) for n in node)
        if isinstance(node, dict) or hasattr(node, 'keys'):
            return place_like(node)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), node)

    opt_state = jax.tree_util.tree_map(
        lambda x: x, state.opt_state)  # structural copy
    # optimizer states that mirror the param tree get the same shardings;
    # fall back to replication for anything else
    try:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            state.opt_state)
    except Exception:
        pass
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state._replace(step=step, params=params, batch_stats=batch_stats,
                          opt_state=opt_state)


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
