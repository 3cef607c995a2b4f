"""COCO AP fidelity goldens (VERDICT r2 task 5a).

pycocotools is not installable in this image, so the golden here is a
direct, independent transcription of the published COCOeval algorithm
(pycocotools/cocoeval.py: ``evaluateImg`` + ``accumulate``), written in
the original's own object style — per-(image,cat) dicts, id-valued
gtm/dtm match arrays, per-areaRng ignore flags — deliberately NOT sharing
code or structure with the repo implementation under test
(`data/datasets/coco.py:coco_style_ap`). Randomized fixtures (crowds,
score ties, mixed areas, maxDets pressure) are checked to 1e-10, plus
hand-derived analytic cases.

Reference evaluates via COCOeval at `mmdet/datasets/coco.py:364`.
"""

import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.data.datasets.coco import (  # noqa: E501
    AREA_ALL, AREA_LARGE, AREA_MEDIUM, AREA_SMALL, coco_style_ap)

IOU_THRS = np.arange(0.5, 1.0, 0.05)
REC_THRS = np.linspace(0, 1, 101)


# ---------------------------------------------------------------------------
# golden: transcription of pycocotools COCOeval (bbox iouType)
# ---------------------------------------------------------------------------

def _iou(dts, gts, iscrowd):
    """maskUtils.iou for bbox: xywh boxes; crowd → inter/det-area."""
    ious = np.zeros((len(dts), len(gts)))
    for j, g in enumerate(gts):
        gx1, gy1, gw, gh = g
        for i, d in enumerate(dts):
            dx1, dy1, dw, dh = d
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + gw * gh - inter
            ious[i, j] = inter / union
    return ious


def _evaluate_img(gt, dt, ious, aRng, maxDet, iouThrs):
    """cocoeval.py COCOeval.evaluateImg, bbox branch."""
    for g in gt:
        g['_ignore'] = 1 if (g['iscrowd'] or g['area'] < aRng[0]
                             or g['area'] > aRng[1]) else 0
    gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
    dt = [dt[i] for i in dtind[:maxDet]]
    iscrowd = [int(g['iscrowd']) for g in gt]
    ious = ious[:, gtind][[i for i in dtind[:maxDet]], :] \
        if len(ious) > 0 else ious
    T = len(iouThrs)
    G, D = len(gt), len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gtIg = np.array([g['_ignore'] for g in gt])
    dtIg = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(iouThrs):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = gt[m]['id']
                gtm[tind, m] = d['id']
    a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                  for d in dt]).reshape((1, len(dt)))
    dtIg = np.logical_or(dtIg, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return {
        'dtMatches': dtm, 'dtIgnore': dtIg, 'gtIgnore': gtIg,
        'dtScores': [d['score'] for d in dt],
    }


def golden_cocoeval(images, aRng=AREA_ALL, maxDet=100, iouThrs=IOU_THRS):
    """cocoeval.py accumulate over one category (images = list of
    (gt_list, dt_list) per image); returns per-IoU AP array."""
    T, R = len(iouThrs), len(REC_THRS)
    evals = []
    for gt, dt in images:
        dboxes = np.array([d['bbox'] for d in dt]).reshape(-1, 4)
        gboxes = np.array([g['bbox'] for g in gt]).reshape(-1, 4)
        ious = _iou(dboxes, gboxes, [int(g['iscrowd']) for g in gt])
        evals.append(_evaluate_img(
            [dict(g) for g in gt], [dict(d) for d in dt],
            ious, aRng, maxDet, iouThrs))
    precision = -np.ones((T, R))
    dtScores = np.concatenate([e['dtScores'][:maxDet] for e in evals])
    inds = np.argsort(-dtScores, kind='mergesort')
    dtm = np.concatenate(
        [e['dtMatches'][:, :maxDet] for e in evals], axis=1)[:, inds]
    dtIg = np.concatenate(
        [e['dtIgnore'][:, :maxDet] for e in evals], axis=1)[:, inds]
    gtIg = np.concatenate([e['gtIgnore'] for e in evals])
    npig = np.count_nonzero(gtIg == 0)
    if npig == 0:
        return None
    tps = np.logical_and(dtm, np.logical_not(dtIg))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros((R,))
        pr = pr.tolist()
        q = q.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds2 = np.searchsorted(rc, REC_THRS, side='left')
        try:
            for ri, pi in enumerate(inds2):
                q[ri] = pr[pi]
        except IndexError:
            pass
        precision[t, :] = np.array(q)
    return precision.mean(axis=1)


# ---------------------------------------------------------------------------
# fixture machinery: random scenes in both representations
# ---------------------------------------------------------------------------

def _random_scene(rng, n_img=4, crowd_p=0.25):
    """Returns (det_results, annotations) for the repo API and the
    cocoeval-style (gt, dt) per-image lists for the golden."""
    det_results, annotations, images = [], [], []
    next_id = 1
    for _ in range(n_img):
        n_gt = rng.randint(0, 6)
        gts, boxes, crowd_boxes = [], [], []
        for _ in range(n_gt):
            # wide size spread so all area bins are populated
            s = float(rng.choice([8, 24, 48, 150, 300]))
            x, y = rng.uniform(0, 500, 2)
            w, h = s * rng.uniform(0.5, 1.5), s * rng.uniform(0.5, 1.5)
            crowd = rng.rand() < crowd_p
            gts.append(dict(id=next_id, bbox=[x, y, w, h], area=w * h,
                            iscrowd=crowd))
            next_id += 1
            (crowd_boxes if crowd else boxes).append(
                [x, y, x + w, y + h])
        n_dt = rng.randint(0, 8)
        dts, drows = [], []
        for _ in range(n_dt):
            if gts and rng.rand() < 0.7:     # perturb a gt box
                g = gts[rng.randint(len(gts))]['bbox']
                x = g[0] + rng.uniform(-5, 5)
                y = g[1] + rng.uniform(-5, 5)
                w = max(2.0, g[2] * rng.uniform(0.6, 1.4))
                h = max(2.0, g[3] * rng.uniform(0.6, 1.4))
            else:
                x, y = rng.uniform(0, 500, 2)
                w, h = rng.uniform(5, 200, 2)
            score = float(rng.choice([0.3, 0.5, 0.5, 0.7, 0.9]))  # ties!
            dts.append(dict(id=next_id, bbox=[x, y, w, h], area=w * h,
                            score=score))
            next_id += 1
            drows.append([x, y, x + w, y + h, score])
        det_results.append([np.asarray(drows, np.float64).reshape(-1, 5)])
        annotations.append(dict(
            bboxes=np.asarray(boxes, np.float64).reshape(-1, 4),
            labels=np.zeros(len(boxes), np.int64),
            bboxes_ignore=np.asarray(crowd_boxes,
                                     np.float64).reshape(-1, 4),
            labels_ignore=np.zeros(len(crowd_boxes), np.int64)))
        images.append((gts, dts))
    return det_results, annotations, images


@pytest.mark.parametrize('seed', range(8))
@pytest.mark.parametrize('area_rng,max_dets', [
    (AREA_ALL, 100), (AREA_SMALL, 100), (AREA_MEDIUM, 100),
    (AREA_LARGE, 100), (AREA_ALL, 3),
])
def test_coco_style_ap_matches_cocoeval(seed, area_rng, max_dets):
    rng = np.random.RandomState(seed)
    det_results, annotations, images = _random_scene(rng)
    want = golden_cocoeval(images, aRng=area_rng, maxDet=max_dets)
    got = coco_style_ap(det_results, annotations, IOU_THRS, 1,
                        max_dets=max_dets, area_rng=area_rng)
    if want is None:
        assert np.all(got == 0)
    else:
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_perfect_detection_ap_is_one():
    anns = [dict(bboxes=np.array([[0., 0., 10., 10.]]),
                 labels=np.zeros(1, np.int64),
                 bboxes_ignore=np.zeros((0, 4)),
                 labels_ignore=np.zeros(0, np.int64))]
    dets = [[np.array([[0., 0., 10., 10., 0.9]])]]
    aps = coco_style_ap(dets, anns, IOU_THRS, 1)
    np.testing.assert_allclose(aps, 1.0)


def test_half_iou_match_only_at_fifty():
    """Det with IoU exactly 0.5 + one far FP: AP=1 at thr .5 (the ranked-
    first TP saturates every recall point), 0 above — mean 0.1."""
    anns = [dict(bboxes=np.array([[0., 0., 10., 10.]]),
                 labels=np.zeros(1, np.int64),
                 bboxes_ignore=np.zeros((0, 4)),
                 labels_ignore=np.zeros(0, np.int64))]
    dets = [[np.array([[0., 0., 10., 5., 0.9],
                       [20., 20., 30., 30., 0.8]])]]
    aps = coco_style_ap(dets, anns, IOU_THRS, 1)
    np.testing.assert_allclose(aps[0], 1.0)
    np.testing.assert_allclose(aps[1:], 0.0)
    np.testing.assert_allclose(np.mean(aps), 0.1)


def test_crowd_absorbs_detection_not_fp():
    """A det inside a crowd region matches it (IoU over det area = 1),
    is marked ignore, and must NOT count as FP ahead of the real TP."""
    anns = [dict(bboxes=np.array([[200., 200., 210., 210.]]),
                 labels=np.zeros(1, np.int64),
                 bboxes_ignore=np.array([[0., 0., 100., 100.]]),
                 labels_ignore=np.zeros(1, np.int64))]
    dets = [[np.array([[10., 10., 20., 20., 0.9],      # inside crowd
                       [200., 200., 210., 210., 0.8]])]]
    aps = coco_style_ap(dets, anns, IOU_THRS, 1)
    np.testing.assert_allclose(aps, 1.0)
    # sanity: without the crowd ann the same det is a rank-1 FP → AP 0.5
    anns[0]['bboxes_ignore'] = np.zeros((0, 4))
    anns[0]['labels_ignore'] = np.zeros(0, np.int64)
    aps_nocrowd = coco_style_ap(dets, anns, IOU_THRS, 1)
    assert np.all(aps_nocrowd < 1.0)


def test_small_area_range_ignores_large_gt_and_det():
    """With area_rng=small, a large gt is ignored (not counted in npig)
    and an unmatched large det is ignored (not an FP)."""
    anns = [dict(bboxes=np.array([[0., 0., 10., 10.],        # small gt
                                  [100., 100., 400., 400.]]),  # large gt
                 labels=np.zeros(2, np.int64),
                 bboxes_ignore=np.zeros((0, 4)),
                 labels_ignore=np.zeros(0, np.int64))]
    dets = [[np.array([[0., 0., 10., 10., 0.6],
                       [500., 500., 800., 800., 0.9]])]]   # large FP
    aps = coco_style_ap(dets, anns, IOU_THRS, 1, area_rng=AREA_SMALL)
    np.testing.assert_allclose(aps, 1.0)


def test_max_dets_cap_is_per_image():
    """maxDets truncates per image by score BEFORE accumulation: with
    max_dets=1 only each image's top-score det survives."""
    anns = [dict(bboxes=np.array([[0., 0., 10., 10.]]),
                 labels=np.zeros(1, np.int64),
                 bboxes_ignore=np.zeros((0, 4)),
                 labels_ignore=np.zeros(0, np.int64))]
    # top-score det is an FP; the true match ranks second → dropped
    dets = [[np.array([[50., 50., 60., 60., 0.9],
                       [0., 0., 10., 10., 0.8]])]]
    aps = coco_style_ap(dets, anns, IOU_THRS, 1, max_dets=1)
    np.testing.assert_allclose(aps, 0.0)
    aps2 = coco_style_ap(dets, anns, IOU_THRS, 1, max_dets=2)
    assert np.all(aps2 > 0)
