"""Train/inference forward tests for SABL RetinaNet (bucketing coder
consumer) and LD (localization distillation, KD-loss consumer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    LDGFocal, SABLRetinaNet)


def _batch(b=1, size=64, g=4):
    return dict(
        image=jnp.asarray(np.random.RandomState(0).rand(b, size, size, 3),
                          jnp.float32),
        gt_bboxes=jnp.broadcast_to(
            jnp.asarray([[4, 4, 30, 30], [10, 10, 50, 40],
                         [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32),
            (b, g, 4)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.broadcast_to(jnp.asarray([True, True, False, False]),
                                  (b, g)),
        img_shape=jnp.full((b, 2), float(size)),
    )


def test_sabl_train_and_inference():
    m = SABLRetinaNet(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox_cls', 'loss_bbox_reg'}
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    assert preds['labels'].shape == preds['valid'].shape


def test_ld_train_and_teacher_frozen():
    m = LDGFocal(num_classes=4, backbone_depth=18, teacher_depth=18)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    assert 'loss_ld' in losses
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)

    def total(p):
        out = m.apply({'params': p, **{k: v[k] for k in v if k != 'params'}},
                      batch)
        return sum(jnp.sum(x) for x in out.values())

    g = jax.grad(total)(v['params'])
    t_mx = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g['teacher']))
    s_mx = max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g['student']))
    assert t_mx == 0.0          # teacher under stop_gradient
    assert s_mx > 0.0

    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
