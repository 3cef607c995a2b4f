"""Unit tests for box ops — golden values mirroring the reference's
`tests/test_utils/test_coder.py` / `test_box_overlap.py` style."""

import numpy as np
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
    bbox_overlaps, delta2bbox, bbox2delta, clip_boxes, flip_boxes, bbox2result)


def test_bbox_overlaps_basic():
    b1 = jnp.array([[0., 0., 10., 10.], [10., 10., 20., 20.]])
    b2 = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.]])
    ious = np.asarray(bbox_overlaps(b1, b2))
    assert ious.shape == (2, 2)
    assert ious[0, 0] == pytest.approx(1.0)
    assert ious[0, 1] == pytest.approx(25. / 175.)
    assert ious[1, 0] == pytest.approx(0.0)


def test_bbox_overlaps_legacy_offset():
    # VOC legacy: w = x2 - x1 + 1
    b = jnp.array([[0., 0., 9., 9.]])
    ious = np.asarray(bbox_overlaps(b, b, offset=1.0))
    assert ious[0, 0] == pytest.approx(1.0)


def test_bbox_overlaps_iof():
    b1 = jnp.array([[0., 0., 10., 10.]])
    b2 = jnp.array([[0., 0., 20., 20.]])
    iof = np.asarray(bbox_overlaps(b1, b2, mode='iof'))
    assert iof[0, 0] == pytest.approx(1.0)


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 50, (16, 4)).astype(np.float32)
    proposals[:, 2:] += proposals[:, :2] + 1.0
    gt = rng.uniform(0, 50, (16, 4)).astype(np.float32)
    gt[:, 2:] += gt[:, :2] + 1.0
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(proposals), jnp.asarray(gt), means, stds)
    rec = delta2bbox(jnp.asarray(proposals), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=5e-3)


def test_delta2bbox_identity():
    rois = jnp.array([[0., 0., 10., 10.]])
    deltas = jnp.zeros((1, 4))
    out = np.asarray(delta2bbox(rois, deltas))
    np.testing.assert_allclose(out, [[0, 0, 10, 10]], atol=1e-5)


def test_clip_and_flip():
    boxes = jnp.array([[-5., -5., 120., 60.]])
    clipped = np.asarray(clip_boxes(boxes, jnp.array([50., 100.])))
    np.testing.assert_allclose(clipped, [[0, 0, 100, 50]])
    flipped = np.asarray(flip_boxes(jnp.array([[10., 0., 30., 20.]]), (50, 100)))
    np.testing.assert_allclose(flipped, [[70, 0, 90, 20]])


def test_bbox2result_format():
    boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 5, 5]], np.float32)
    labels = np.array([0, 1, 0])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([True, True, False])
    res = bbox2result(boxes, labels, scores, valid, num_classes=2)
    assert len(res) == 2
    assert res[0].shape == (1, 5)
    assert res[1].shape == (1, 5)
    assert res[0][0, 4] == pytest.approx(0.9)


def test_distance_coder_roundtrip():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
        distance2bbox, bbox2distance)
    pts = jnp.array([[50., 50.], [20., 80.]])
    boxes = jnp.array([[40., 30., 70., 90.], [10., 60., 35., 95.]])
    d = bbox2distance(pts, boxes)
    rec = distance2bbox(pts, d)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-5)


def test_tblr_coder_roundtrip():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
        bbox2tblr, tblr2bbox)
    priors = jnp.array([[40., 40., 60., 60.]])
    gts = jnp.array([[35., 30., 70., 65.]])
    enc = bbox2tblr(priors, gts)
    rec = tblr2bbox(priors, enc)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gts), atol=1e-4)
