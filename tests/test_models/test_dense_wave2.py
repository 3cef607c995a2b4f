"""Train/inference forward tests for the second-wave single-stage families
(VFNet, RepPoints, YOLOF, FSAF, FoveaBox, FreeAnchor, AutoAssign, PAA),
mirroring `tests/test_models/test_forward.py` patterns on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    VFNet, RepPoints, YOLOF, FSAF, FoveaBox, FreeAnchor, AutoAssign, PAA,
    gmm_split, points2bbox_moment)

FAMILIES = [VFNet, RepPoints, YOLOF, FSAF, FoveaBox, FreeAnchor,
            AutoAssign, PAA]


def _batch(b=1, size=64, g=4):
    return dict(
        # nonzero image: with a zero image every trunk activation is zero
        # and weight gradients (delta x input) vanish identically
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


@pytest.mark.parametrize('cls', FAMILIES, ids=lambda c: c.__name__)
def test_train_and_inference_forward(cls):
    m = cls(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    assert preds['labels'].shape == preds['valid'].shape


@pytest.mark.parametrize('cls', [VFNet, RepPoints, AutoAssign],
                         ids=lambda c: c.__name__)
def test_gradients_flow_to_backbone(cls):
    m = cls(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)

    def total(p):
        out = m.apply({'params': p, **{k: v[k] for k in v
                                       if k != 'params'}}, batch)
        return sum(jnp.sum(x) for x in out.values())

    g = jax.grad(total)(v['params'])
    bb = g['backbone']
    mx = max(float(jnp.abs(l).max())
             for l in jax.tree_util.tree_leaves(bb))
    assert mx > 0


class TestPAAGMM:
    def test_separates_bimodal(self):
        rs = np.random.RandomState(0)
        low = rs.normal(0.5, 0.05, 20)
        high = rs.normal(5.0, 0.2, 20)
        losses = jnp.asarray(np.concatenate([low, high])[None],
                             jnp.float32)
        valid = jnp.ones((1, 40), bool)
        pos = np.asarray(gmm_split(losses, valid))[0]
        assert pos[:20].all()
        assert not pos[20:].any()

    def test_handles_padding(self):
        losses = jnp.asarray([[0.1, 0.2, 5.0, 0.0]], jnp.float32)
        valid = jnp.asarray([[True, True, True, False]])
        pos = np.asarray(gmm_split(losses, valid))[0]
        assert not pos[3]


class TestRepPointsTransform:
    def test_moment_transfer_box(self):
        # 9 points on a 10x20 rectangle grid: mean center, std ~ extent
        xs, ys = np.meshgrid([0, 5, 10], [0, 10, 20])
        pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1)[None],
                          jnp.float32)
        box = np.asarray(points2bbox_moment(pts, jnp.zeros(2)))[0]
        cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
        np.testing.assert_allclose([cx, cy], [5.0, 10.0], atol=1e-4)
        assert box[2] - box[0] > 0 and box[3] - box[1] > 0
