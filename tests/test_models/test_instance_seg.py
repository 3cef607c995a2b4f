"""Forward tests for SOLO, YOLACT and CornerNet on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors import (
    SOLO, YOLACT, CornerNet)


def _batch():
    rs = np.random.RandomState(0)
    return dict(
        image=jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32),
        gt_bboxes=jnp.asarray([[[4, 4, 30, 30], [10, 10, 50, 40],
                                [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.asarray([[True, True, False, False]]),
        gt_masks_full=jnp.asarray(rs.rand(1, 4, 16, 16) > 0.5),
        img_shape=jnp.asarray([[64, 64]], jnp.float32),
    )


def test_solo():
    m = SOLO(num_classes=4, backbone_depth=18, grid_sizes=(8, 8, 6, 4, 4))
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    assert set(losses) == {'loss_cls', 'loss_mask'}
    assert all(bool(jnp.isfinite(x)) for x in losses.values())
    preds = m.apply(v, batch, train=False)
    assert preds['masks'].shape == (1, 100, 16, 16)
    assert preds['masks'].dtype == jnp.bool_
    # box eval path (apis/test.run_inference): dets (B, k, 5) from
    # quantile-robust mask extents, zeroed score where invalid
    assert preds['dets'].shape == (1, 100, 5)
    dets = np.asarray(preds['dets'])
    masks = np.asarray(preds['masks'])
    valid = np.asarray(preds['valid'])
    for i in np.where(valid[0])[0][:5]:
        ys, xs = np.where(masks[0, i])
        x1, y1, x2, y2 = dets[0, i, :4]
        assert x2 > x1 and y2 > y1
        assert x1 >= xs.min() * 4 and x2 <= (xs.max() + 1) * 4
        assert y1 >= ys.min() * 4 and y2 <= (ys.max() + 1) * 4
    assert not np.any(dets[0, ~valid[0], 4] > 0)


def test_yolact():
    m = YOLACT(num_classes=4, backbone_depth=18)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    assert {'loss_cls', 'loss_bbox', 'loss_mask',
            'loss_segm'} == set(losses)
    assert all(bool(jnp.isfinite(x)) for x in losses.values())
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    assert preds['masks'].shape[-2:] == (16, 16)


def test_yolact_without_masks_trains_boxes_only():
    m = YOLACT(num_classes=4, backbone_depth=18)
    batch = _batch()
    del batch['gt_masks_full']
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    assert set(losses) == {'loss_cls', 'loss_bbox'}


def test_cornernet():
    m = CornerNet(num_classes=4, downsample_times=3,
                  stage_channels=(64, 64, 96, 96),
                  stage_blocks=(1, 1, 1, 1), corner_topk=20)
    batch = _batch()
    v = m.init(jax.random.PRNGKey(0), batch)
    losses = m.apply(v, batch)
    # intermediate + final stack supervision
    assert 'loss_heatmap' in losses and 's0.loss_heatmap' in losses
    assert {'loss_pull', 'loss_push', 'loss_offset'} <= set(losses)
    assert all(bool(jnp.isfinite(x)) for x in losses.values())
    preds = m.apply(v, batch, train=False)
    assert preds['dets'].shape[-1] == 5
    # paired corners respect geometry: x2 > x1 for valid detections
    d = np.asarray(preds['dets'])[0]
    val = np.asarray(preds['valid'])[0]
    if val.any():
        assert (d[val, 2] >= d[val, 0]).all()
