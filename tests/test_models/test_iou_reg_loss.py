"""RoI-head decoded-box regression losses (reference
`configs/faster_rcnn/faster_rcnn_r50_fpn_{iou,giou,ciou,bounded_iou}_1x_coco.py`
→ `bbox_head.loss_bbox` type + `reg_decoded_bbox=True`,
`mmdet/models/losses/iou_loss.py`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox.transforms import (  # noqa: E501
    bbox2delta)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses.iou_loss import (  # noqa: E501
    bounded_iou_loss)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (  # noqa: E501
    RoITrainConfig, SampledRoIs, bbox_loss)


def _fabricated(num_classes=3, b=2, s=8, seed=0):
    rng = np.random.RandomState(seed)
    rois = rng.uniform(10, 60, (b, s, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(8, 30, (b, s, 2))
    gt = rois + rng.uniform(-3, 3, rois.shape).astype(np.float32)
    cfg = RoITrainConfig()
    deltas = bbox2delta(jnp.asarray(rois.reshape(-1, 4)),
                        jnp.asarray(gt.reshape(-1, 4)),
                        cfg.target_means, cfg.target_stds).reshape(b, s, 4)
    sampled = SampledRoIs(
        rois=jnp.asarray(rois),
        labels=jnp.asarray(rng.randint(0, num_classes, (b, s))),
        label_valid=jnp.ones((b, s), bool),
        is_pos=jnp.asarray(rng.rand(b, s) > 0.4),
        reg_targets=deltas,
        matched_gt=jnp.zeros((b, s), jnp.int32))
    return sampled


@pytest.mark.parametrize('reg_loss', ['iou', 'giou', 'ciou', 'bounded_iou'])
def test_iou_family_reg_loss_finite_and_differentiable(reg_loss):
    num_classes = 3
    sampled = _fabricated(num_classes)
    b, s = sampled.labels.shape
    cfg = RoITrainConfig(reg_loss=reg_loss, reg_loss_weight=10.0,
                         use_sigmoid_cls=False)
    rng = np.random.RandomState(1)
    cls_scores = jnp.asarray(rng.randn(b, s, num_classes + 1),
                             jnp.float32)

    def loss_of(reg_preds):
        out = bbox_loss(cls_scores, reg_preds, sampled, num_classes, cfg)
        return out['loss_bbox']

    reg_preds = jnp.asarray(rng.randn(b, s, 4) * 0.1, jnp.float32)
    val, grad = jax.value_and_grad(loss_of)(reg_preds)
    assert np.isfinite(float(val)) and float(val) > 0
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0

    # perfect predictions (pred deltas == target deltas) → ~zero loss
    zero = float(loss_of(sampled.reg_targets))
    assert zero < float(val)
    if reg_loss != 'iou':          # -log(iou) form is 0 at iou=1 too
        assert zero < 1e-3
    else:
        assert zero < 1e-3


def test_bounded_iou_perfect_is_zero():
    p = jnp.asarray([[10., 10., 50., 30.]])
    assert float(bounded_iou_loss(p, p, reduction='sum')) < 1e-6
