"""Forward tests for the two-stage RoI-head variants (HTC, Mask Scoring,
Double-Head, Dynamic, Grid, PointRend) on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
    ProposalConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
    RoITrainConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    HTC, MaskScoringRCNN, DoubleHeadRCNN, DynamicRCNN, GridRCNN, PointRend)

PC = ProposalConfig(nms_pre=256, max_per_img=64)
RC = RoITrainConfig(use_sigmoid_cls=False, num_samples=32)


def _batch():
    rs = np.random.RandomState(0)
    return dict(
        image=jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray([[[4, 4, 30, 30], [10, 10, 50, 40],
                                [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray([[True, True, False, False]]),
        gt_masks=jnp.asarray(rs.rand(1, 4, 28, 28) > 0.5),
        gt_semantic_seg=jnp.zeros((1, 64, 64), jnp.int32),
        img_shape=jnp.asarray([[64, 64]], jnp.float32),
    )


def _make(cls, **kw):
    return cls(num_classes=4, backbone_depth=18, rpn_proposal_cfg=PC,
               rpn_test_cfg=PC, **kw)


@pytest.mark.parametrize('make,expect_losses', [
    (lambda: HTC(num_classes=4, backbone_depth=18, num_samples=32,
                 semantic_classes=8, rpn_proposal_cfg=PC, rpn_test_cfg=PC),
     {'loss_semantic', 's0.loss_mask', 's2.loss_cls'}),
    (lambda: _make(MaskScoringRCNN, roi_train_cfg=RC),
     {'loss_mask', 'loss_mask_iou'}),
    (lambda: _make(DoubleHeadRCNN, roi_train_cfg=RC),
     {'loss_cls', 'loss_bbox'}),
    (lambda: _make(DynamicRCNN, roi_train_cfg=RC),
     {'loss_cls', 'loss_bbox'}),
    (lambda: _make(GridRCNN, roi_train_cfg=RC),
     {'loss_cls', 'loss_grid'}),
    (lambda: _make(PointRend, roi_train_cfg=RC),
     {'loss_mask', 'loss_point'}),
], ids=['HTC', 'MaskScoring', 'DoubleHead', 'Dynamic', 'Grid',
        'PointRend'])
def test_train_and_inference(make, expect_losses):
    m = make()
    batch = _batch()
    v = m.init({'params': jax.random.PRNGKey(0),
                'sampler': jax.random.PRNGKey(1)}, batch)
    losses = m.apply(v, batch, rngs={'sampler': jax.random.PRNGKey(2)})
    assert expect_losses <= set(losses)
    for k, x in losses.items():
        assert bool(jnp.isfinite(x)), (k, x)
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    if isinstance(m, (HTC, MaskScoringRCNN, PointRend)):
        assert 'masks' in preds
