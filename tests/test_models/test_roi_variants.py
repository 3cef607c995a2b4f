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


def test_grid_targets_decode_round_trip():
    """Grid R-CNN invariant: argmax-decoding the training heatmap targets in
    the same 2x-expanded roi frame recovers the gt corners (reference
    `grid_head.py:232-237,326-333` frame conventions)."""
    m = _make(GridRCNN, roi_train_cfg=RC)
    gs = m.grid_size
    rois = jnp.asarray([[[8.0, 6.0, 40.0, 30.0]]])           # (1,1,4)
    gt = jnp.asarray([[[10.0, 8.0, 36.0, 28.0]]])
    heat = m._grid_targets.__wrapped__(m, rois, gt) if hasattr(
        m._grid_targets, '__wrapped__') else GridRCNN._grid_targets(
        m, rois, gt)                                          # (1,1,G,G,9)
    assert heat.shape == (1, 1, gs, gs, 9)
    # every point marks a radius-1 circle (5 px, fewer only at map borders)
    npix = jnp.sum(heat, axis=(2, 3))
    assert bool(jnp.all(npix >= 3)) and bool(jnp.all(npix <= 5))
    flat = heat.transpose(0, 1, 4, 2, 3).reshape(1, 1, 9, gs * gs)
    idx = jnp.argmax(flat, axis=-1)
    vi = (idx // gs).astype(jnp.float32) + 0.5
    ui = (idx % gs).astype(jnp.float32) + 0.5
    exp = GridRCNN._expand2x(rois)
    ew = exp[..., 2] - exp[..., 0]
    eh = exp[..., 3] - exp[..., 1]
    px = exp[..., 0:1] + ui[0, 0][None, None] / gs * ew[..., None]
    py = exp[..., 1:2] + vi[0, 0][None, None] / gs * eh[..., None]
    # corners: point 0 = (x1,y1), point 8 = (x2,y2); tolerance = one cell
    cell = float(jnp.maximum(ew, eh)[0, 0]) / gs
    assert abs(float(px[0, 0, 0]) - 10.0) <= cell + 0.51
    assert abs(float(py[0, 0, 0]) - 8.0) <= cell + 0.51
    assert abs(float(px[0, 0, 8]) - 36.0) <= cell + 0.51
    assert abs(float(py[0, 0, 8]) - 28.0) <= cell + 0.51
