"""NMS correctness: compare the tiled TPU NMS against a reference
numpy greedy implementation (mirrors `tests/test_utils/test_nms.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post import (
    nms, nms_select, batched_nms, multiclass_nms)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post.nms import NEG_INF


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= NEG_INF / 2:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            # iou
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.maximum(rb - lt, 0)
            inter = wh[0] * wh[1]
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-6) > thr:
                suppressed[j] = True
    return sorted(keep)


@pytest.mark.parametrize('n,seed', [(64, 0), (300, 1), (700, 2)])
def test_nms_matches_greedy(n, seed):
    rng = np.random.RandomState(seed)
    ctrs = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = np.concatenate([ctrs - wh / 2, ctrs + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep, _ = jax.jit(nms, static_argnums=(2, 3))(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 128)
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    want = np_greedy_nms(boxes, scores, 0.5)
    assert got == want


def test_nms_invalid_entries_ignored():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, NEG_INF, 0.8])
    keep, _ = nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_nms_select_padding():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.85, 0.8])
    out_boxes, out_scores, valid = nms_select(boxes, scores, 0.5, max_out=4)
    assert out_boxes.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])
    assert np.asarray(out_scores)[0] == pytest.approx(0.9)
    # suppressed and padded slots zeroed
    np.testing.assert_allclose(np.asarray(out_boxes)[2:], 0)


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    idxs = jnp.array([0, 1])
    keep, _ = batched_nms(boxes, scores, idxs, 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, True])
    keep_ca, _ = batched_nms(boxes, scores, idxs, 0.5, class_agnostic=True)
    np.testing.assert_array_equal(np.asarray(keep_ca), [True, False])


def test_multiclass_nms():
    # 2 classes + bg; 3 candidate boxes
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10.5, 10.5], [30, 30, 40, 40]],
                      jnp.float32)
    scores = jnp.array([
        [0.9, 0.01, 0.09],
        [0.85, 0.02, 0.13],
        [0.01, 0.7, 0.29],
    ], jnp.float32)
    dets, labels, valid = multiclass_nms(boxes, scores, score_thr=0.05,
                                         iou_threshold=0.5, max_per_img=5)
    v = np.asarray(valid)
    assert v.sum() == 2  # box1 suppressed by box0 within class 0
    lbls = np.asarray(labels)[v]
    assert set(lbls.tolist()) == {0, 1}
    assert np.asarray(dets)[0, 4] == pytest.approx(0.9)


def test_multiclass_nms_soft_type():
    """multiclass_nms nms_type='soft_nms': the overlapping box is decayed,
    not removed — both survive with the second one's score reduced."""
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10.5, 10.5], [30, 30, 40, 40]],
                      jnp.float32)
    scores = jnp.array([
        [0.9, 0.01, 0.09],
        [0.85, 0.02, 0.13],
        [0.01, 0.7, 0.29],
    ], jnp.float32)
    dets, labels, valid = multiclass_nms(
        boxes, scores, score_thr=0.05, iou_threshold=0.5, max_per_img=5,
        nms_type='soft_nms', soft_method='linear', soft_min_score=1e-3)
    v = np.asarray(valid)
    assert v.sum() == 3  # soft: box1 decayed (iou~0.9 -> score*0.09), kept
    d = np.asarray(dets)
    assert d[0, 4] == pytest.approx(0.9)
    # decayed score of the overlapped class-0 box: 0.85 * (1 - iou)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox.iou import bbox_overlaps
    iou01 = float(bbox_overlaps(boxes[:1], boxes[1:2])[0, 0])
    decayed = 0.85 * (1 - iou01)
    assert np.isclose(d[:, 4], decayed, atol=1e-5).any()


def test_fast_nms_suppression_semantics():
    """fast NMS (YOLACT, reference bbox_nms.py:98): any higher-scored
    same-class overlap suppresses — including chains where greedy NMS
    would re-admit."""
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post import fast_nms
    # A(0.9) suppresses B(0.8); greedy re-admits C(0.7) (overlaps B only),
    # fast NMS also keeps C only if it doesn't overlap B above thr — here it
    # does overlap B, so fast NMS drops it while keeping A.
    boxes = jnp.array([[0., 0., 10., 10.],     # A
                       [1., 0., 11., 10.],     # B: IoU(A,B) ~ 0.82
                       [8., 0., 18., 10.]])    # C: IoU(B,C) ~ 0.18, IoU(A,C) ~ 0.11
    scores = jnp.array([0.9, 0.8, 0.7])
    labels = jnp.zeros(3, jnp.int32)
    dets, out_labels, valid = fast_nms(boxes, scores, labels,
                                       iou_threshold=0.5, score_thr=0.0,
                                       max_out=3)
    assert bool(valid[0]) and abs(float(dets[0, 4]) - 0.9) < 1e-6
    # B suppressed by A; C kept (low IoU with both)
    kept_scores = sorted(float(s) for s, v in zip(dets[:, 4], valid) if v)
    import numpy as np
    np.testing.assert_allclose(kept_scores, [0.7, 0.9], atol=1e-6)
    # different classes never suppress each other
    labels2 = jnp.array([0, 1, 0], jnp.int32)
    _, _, valid2 = fast_nms(boxes, scores, labels2, iou_threshold=0.5,
                            score_thr=0.0, max_out=3)
    assert int(valid2.sum()) == 3
