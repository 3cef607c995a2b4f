"""Forward tests for the query-based families (DeformableDETR,
SparseRCNN) on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    DeformableDETR, SparseRCNN)


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


@pytest.mark.parametrize('make', [
    lambda: DeformableDETR(num_classes=4, backbone_depth=18,
                           num_queries=20, enc_layers=2, dec_layers=2),
    lambda: SparseRCNN(num_classes=4, backbone_depth=18, num_proposals=20,
                       num_stages=2),
], ids=['DeformableDETR', 'SparseRCNN'])
def test_train_and_inference(make):
    m = make()
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    final = {k: v_ for k, v_ in losses.items() if '.' not in k}
    assert set(final) == {'loss_cls', 'loss_bbox', 'loss_iou'}
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    # aux losses present for intermediate layers/stages
    assert any('.' in k for k in losses)


def test_detr_gradient_balance():
    """Regression for the decoder-layer-0 degenerate LayerNorm.

    With zero content queries, layer 0's self-attn fed LayerNorm an
    exactly-zero input whose 1/sqrt(eps) backward inflated two bias grads
    ~1000x over every other parameter; under the reference recipe
    (global clip 0.1) that froze all learning (query_embed grad ~1e-3 of
    the max leaf). The layer-0 self-attn block is now skipped
    (functionally a constant there). Guard: query_embed's grad must be
    within 3 orders of magnitude of the largest leaf grad-norm.
    """
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import DETR
    m = DETR(num_classes=4, backbone_depth=18, num_queries=20,
             enc_layers=1, dec_layers=2, frozen_stages=0)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)

    def total(p):
        out = m.apply({'params': p, **{k: v[k] for k in v
                                       if k != 'params'}}, batch)
        return sum(jnp.sum(x) for x in out.values())

    g = jax.grad(total)(v['params'])
    # no self_attn params exist in decoder layer 0
    assert 'self_attn' not in g['dec0']
    norms = {p: float(jnp.linalg.norm(l))
             for p, l in jax.tree_util.tree_flatten_with_path(g)[0]
             for p in [jax.tree_util.keystr(p)]}
    q = norms["['query_embed']"]
    assert q > 0
    assert q > max(norms.values()) * 1e-3, norms


def test_deformable_detr_backbone_grads():
    m = DeformableDETR(num_classes=4, backbone_depth=18, num_queries=20,
                       enc_layers=1, dec_layers=2)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)

    def total(p):
        out = m.apply({'params': p, **{k: v[k] for k in v
                                       if k != 'params'}}, batch)
        return sum(jnp.sum(x) for x in out.values())

    g = jax.grad(total)(v['params'])
    mx = max(float(jnp.abs(l).max())
             for l in jax.tree_util.tree_leaves(g['backbone']))
    assert mx > 0
