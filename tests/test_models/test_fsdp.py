"""FSDP-style param sharding: train step compiles + executes on the
8-device virtual mesh and matches the replicated loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
    FasterRCNN)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.parallel import (
    fsdp_param_shardings, make_mesh)


def test_fsdp_sharding_rules_and_loss_parity():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh(8)
    m = FasterRCNN(num_classes=4, backbone_depth=18)
    b = dict(
        image=jnp.asarray(np.random.RandomState(0).rand(8, 64, 64, 3),
                          jnp.float32),
        gt_bboxes=jnp.broadcast_to(
            jnp.asarray([[4, 4, 30, 30], [10, 10, 50, 40],
                         [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32),
            (8, 4, 4)),
        gt_labels=jnp.zeros((8, 4), jnp.int32),
        gt_valid=jnp.broadcast_to(jnp.asarray([True, True, False, False]),
                                  (8, 4)),
        img_shape=jnp.full((8, 2), 64.0),
    )
    rngs = {'params': jax.random.PRNGKey(0),
            'sampler': jax.random.PRNGKey(1)}
    v = m.init(rngs, b)

    shards = fsdp_param_shardings(v['params'], mesh, 'data')
    specs = {jax.tree_util.keystr(k): s.spec for k, s in
             jax.tree_util.tree_flatten_with_path(shards)[0]}
    # the big bbox-head FC must actually shard; tiny biases must not
    assert any(s != jax.sharding.PartitionSpec() for s in specs.values())

    def loss_fn(params):
        out = m.apply({'params': params, **{k: v[k] for k in v
                                            if k != 'params'}}, b,
                      rngs={'sampler': jax.random.PRNGKey(2)})
        return sum(jnp.sum(x) for x in out.values())

    ref = float(jax.jit(loss_fn)(v['params']))
    with mesh:
        sharded = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), v['params'], shards)
        got = float(jax.jit(loss_fn)(sharded))
    assert abs(ref - got) / max(abs(ref), 1e-6) < 1e-4
