"""Mask R-CNN: box-frame mask targets, mask head shapes, full forward."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.mask_rcnn import (
    MaskRCNN, paste_masks)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.mask_head import (
    mask_targets_from_box_frame)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
    ProposalConfig)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
    RoITrainConfig, RoITestConfig)

from .test_forward import demo_batch


def test_mask_targets_identity_crop():
    """A RoI equal to its gt box must reproduce the gt raster (resampled)."""
    m = 16
    # raster: left half on
    raster = np.zeros((1, 1, m, m), np.uint8)
    raster[..., :, :m // 2] = 1
    gt_boxes = jnp.asarray([[[10., 10., 50., 30.]]])
    rois = gt_boxes[:, :1, :]
    matched = jnp.zeros((1, 1), jnp.int32)
    t = mask_targets_from_box_frame(jnp.asarray(raster), gt_boxes, rois,
                                    matched, out_size=8)
    t = np.asarray(t)[0, 0]
    assert t[:, :3].min() > 0.9   # left on
    assert t[:, 5:].max() < 0.1   # right off


def test_mask_targets_half_crop():
    """A RoI covering the right half of the gt box sees only that half."""
    m = 16
    raster = np.zeros((1, 1, m, m), np.uint8)
    raster[..., :, :m // 2] = 1
    gt_boxes = jnp.asarray([[[0., 0., 40., 40.]]])
    rois = jnp.asarray([[[20., 0., 40., 40.]]])   # right half
    matched = jnp.zeros((1, 1), jnp.int32)
    t = np.asarray(mask_targets_from_box_frame(
        jnp.asarray(raster), gt_boxes, rois, matched, out_size=8))[0, 0]
    assert t.max() < 0.2    # right half of the raster is empty


def test_mask_rcnn_forward():
    model = MaskRCNN(
        backbone_depth=18, num_classes=3, mask_size=14,
        rpn_proposal_cfg=ProposalConfig(nms_pre=256, max_per_img=64,
                                        nms_tile=128),
        rpn_test_cfg=ProposalConfig(nms_pre=256, max_per_img=64,
                                    nms_tile=128),
        roi_train_cfg=RoITrainConfig(num_samples=16, use_sigmoid_cls=False),
        roi_test_cfg=RoITestConfig(max_per_img=8, nms_pre=128, nms_tile=128))
    batch = demo_batch(h=64, w=64)
    m = 32
    rng = np.random.RandomState(0)
    batch['gt_masks'] = jnp.asarray(
        rng.randint(0, 2, (2, batch['gt_bboxes'].shape[1], m, m)),
        jnp.uint8)
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                           train=True)
    losses, _ = model.apply(variables, batch, train=True,
                            rngs={'sampler': k, 'dropout': k},
                            mutable=['batch_stats'])
    assert 'loss_mask' in losses
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    dets = model.apply(variables, batch, train=False)
    assert dets['masks'].shape == (2, 8, 14, 14)
    assert float(dets['masks'].max()) <= 1.0


def test_paste_masks():
    masks = np.ones((1, 4, 4), np.float32)
    boxes = np.array([[2., 2., 6., 6.]])
    out = paste_masks(masks, boxes, 8, 8)
    assert out.shape == (1, 8, 8)
    assert out[0, 3, 3] and not out[0, 0, 0]


def test_cascade_mask_rcnn_train_and_predict():
    """CascadeMaskRCNN (reference cascade_mask_rcnn_* configs): per-stage
    mask losses present; predict returns averaged-stage mask probs."""
    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
        CascadeMaskRCNN)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.dense_heads.rpn_head import (
        ProposalConfig)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
        RoITestConfig)

    m = CascadeMaskRCNN(
        num_classes=3, backbone_depth=18, num_samples=32,
        rpn_proposal_cfg=ProposalConfig(nms_pre=256, max_per_img=64),
        rpn_test_cfg=ProposalConfig(nms_pre=256, max_per_img=64),
        roi_test_cfg=RoITestConfig(max_per_img=10))
    batch = dict(
        image=jnp.zeros((1, 64, 64, 3)),
        gt_bboxes=jnp.array([[[4., 4., 24., 24.], [30., 30., 52., 52.]]]),
        gt_labels=jnp.array([[0, 2]]), gt_valid=jnp.array([[True, True]]),
        gt_masks=jnp.ones((1, 2, 28, 28)),
        img_shape=jnp.array([[64., 64.]]))
    v = m.init({'params': jax.random.PRNGKey(0),
                'sampler': jax.random.PRNGKey(1)}, batch, True)
    losses = m.apply(v, batch, True, rngs={'sampler': jax.random.PRNGKey(2)})
    for i in range(3):
        assert f's{i}.loss_mask' in losses
        assert f's{i}.loss_cls' in losses
    assert all(bool(jnp.isfinite(x)) for x in losses.values())
    out = m.apply(v, batch, False)
    assert out['masks'].shape == (1, 10, 28, 28)
    assert float(out['masks'].max()) <= 1.0
