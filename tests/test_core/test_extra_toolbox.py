"""Tests for the second-wave assigners/samplers/coders.

Mirrors the reference's golden-value style (`tests/test_utils/test_assigner.py`,
`test_coder.py`) on tiny hand-checkable inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
    grid_assign, point_assign, uniform_assign, approx_max_iou_assign,
    center_region_assign, iou_balanced_sample, combined_sample,
    pseudo_sample, score_hlr_sample, bbox2bucket, bucket2bbox,
    legacy_bbox2delta, legacy_delta2bbox, bbox_rescale)


def _pad_gt(boxes, labels, g=4):
    gt = np.zeros((g, 4), np.float32)
    lb = np.zeros((g,), np.int32)
    valid = np.zeros((g,), bool)
    gt[:len(boxes)] = boxes
    lb[:len(labels)] = labels
    valid[:len(boxes)] = True
    return jnp.asarray(gt), jnp.asarray(lb), jnp.asarray(valid)


class TestGridAssign:
    def test_responsible_cells_gate_positives(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [10, 0, 20, 10],
                               [0, 10, 10, 20], [10, 10, 20, 20]],
                              jnp.float32)
        gt, lb, valid = _pad_gt([[0, 0, 10, 10]], [2])
        resp = jnp.asarray([True, False, False, False])
        res = grid_assign(anchors, resp, gt, valid, lb,
                          pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.0)
        assert int(res.assigned_gt_inds[0]) == 1
        assert int(res.labels[0]) == 2
        # anchor 1 overlaps nothing above neg thr -> background
        assert int(res.assigned_gt_inds[1]) == 0
        # flip responsibility off: nothing positive
        res2 = grid_assign(anchors, jnp.zeros((4,), bool), gt, valid, lb)
        assert not bool(jnp.any(res2.assigned_gt_inds > 0))


class TestPointAssign:
    def test_nearest_points_on_matching_level(self):
        # stride-8 points on a grid; one 32x32 gt (level log2(32/4)=3)
        xs, ys = jnp.meshgrid(jnp.arange(4) * 8.0 + 4, jnp.arange(4) * 8.0 + 4)
        pts = jnp.stack([xs.ravel(), ys.ravel(),
                         jnp.full((16,), 8.0)], axis=-1)
        gt, lb, valid = _pad_gt([[0, 0, 32, 32]], [1])
        res = point_assign(pts, gt, valid, lb, scale=4.0, pos_num=3)
        pos = np.asarray(res.assigned_gt_inds) > 0
        assert pos.sum() == 3
        # the claimed points are the nearest to the gt center (16, 16)
        d = np.linalg.norm(np.asarray(pts[:, :2]) - 16.0, axis=1)
        assert set(np.where(pos)[0]) <= set(np.argsort(d)[:4])

    def test_smaller_distance_wins_between_gts(self):
        pts = jnp.asarray([[16.0, 16.0, 8.0]])
        gt, lb, valid = _pad_gt([[0, 0, 32, 32], [8, 8, 40, 40]], [1, 2])
        res = point_assign(pts, gt, valid, lb, scale=4.0, pos_num=1)
        # centers: (16,16) d=0 for gt1; (24,24) for gt2 -> gt1 wins
        assert int(res.assigned_gt_inds[0]) == 1


class TestUniformAssign:
    def test_topk_by_l1_with_ignore_rules(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                               [100, 100, 110, 110]], jnp.float32)
        preds = anchors + 1.0
        gt, lb, valid = _pad_gt([[0, 0, 10, 10]], [0])
        res = uniform_assign(preds, anchors, gt, valid, lb, match_times=1,
                             pos_ignore_thr=0.15, neg_ignore_thr=0.7)
        assert int(res.assigned_gt_inds[0]) == 1     # nearest anchor
        assert int(res.assigned_gt_inds[2]) == 0     # far anchor negative

    def test_low_iou_match_ignored(self):
        anchors = jnp.asarray([[200, 200, 210, 210]], jnp.float32)
        preds = anchors
        gt, lb, valid = _pad_gt([[0, 0, 10, 10]], [0])
        res = uniform_assign(preds, anchors, gt, valid, lb, match_times=1)
        assert int(res.assigned_gt_inds[0]) == -1    # matched but IoU ~ 0


class TestApproxAndCenterRegion:
    def test_approx_uses_best_of_group(self):
        # square's approxs include one perfect match
        approxs = jnp.asarray([[[0, 0, 5, 5], [0, 0, 10, 10]],
                               [[50, 50, 60, 60], [55, 55, 70, 70]]],
                              jnp.float32)
        squares = approxs[:, 0]
        gt, lb, valid = _pad_gt([[0, 0, 10, 10]], [3])
        res = approx_max_iou_assign(approxs, squares, gt, valid, lb,
                                    pos_iou_thr=0.7, neg_iou_thr=0.3)
        assert int(res.assigned_gt_inds[0]) == 1
        assert int(res.assigned_gt_inds[1]) == 0

    def test_center_region_smallest_gt_wins(self):
        priors = jnp.asarray([[15, 15, 17, 17]], jnp.float32)  # center (16,16)
        gt, lb, valid = _pad_gt([[0, 0, 32, 32], [12, 12, 20, 20]], [1, 2])
        res = center_region_assign(priors, gt, valid, lb,
                                   pos_scale=1.0, neg_scale=1.0)
        assert int(res.assigned_gt_inds[0]) == 2     # smaller-area gt
        assert int(res.labels[0]) == 2

    def test_center_region_shadow_ignore(self):
        priors = jnp.asarray([[30, 30, 34, 34]], jnp.float32)  # center (32,32)
        gt, lb, valid = _pad_gt([[0, 0, 40, 40]], [1])
        # core = 0.2*40 = 8px box around (20,20): prior outside core,
        # inside shadow(1.0) -> ignored
        res = center_region_assign(priors, gt, valid, lb,
                                   pos_scale=0.2, neg_scale=1.0)
        assert int(res.assigned_gt_inds[0]) == -1


class TestExtraSamplers:
    def _assigned(self, n=64, npos=10, num_gt=3, seed=0):
        rs = np.random.RandomState(seed)
        a = np.zeros((n,), np.int32)
        pos_idx = rs.choice(n, npos, replace=False)
        a[pos_idx] = rs.randint(1, num_gt + 1, npos)
        iou = np.clip(rs.rand(n) * 0.3, 0, 0.29)
        iou[pos_idx] = 0.5 + 0.5 * rs.rand(npos)
        return jnp.asarray(a), jnp.asarray(iou.astype(np.float32))

    def test_iou_balanced_quota_and_validity(self):
        a, iou = self._assigned()
        res = iou_balanced_sample(jax.random.PRNGKey(0), a, iou,
                                  num=32, pos_fraction=0.25, num_bins=3)
        assert res.inds.shape == (32,)
        assert int(res.valid.sum()) == 32
        assert int(res.is_pos.sum()) == 8
        # all selected negatives really are negatives
        sel_neg = np.asarray(res.inds)[np.asarray(res.valid & ~res.is_pos)]
        assert (np.asarray(a)[sel_neg] == 0).all()

    def test_instance_balanced_spreads_over_gts(self):
        # gt1 has 20 positives, gt2 has 2: balanced sampling takes all of
        # gt2's and quota-limits gt1
        a = np.zeros((64,), np.int32)
        a[:20] = 1
        a[20:22] = 2
        res = combined_sample(jax.random.PRNGKey(1), jnp.asarray(a),
                              jnp.zeros((64,)), num=16, pos_fraction=0.5,
                              num_gt=2)
        sel = np.asarray(res.inds)[np.asarray(res.valid & res.is_pos)]
        got2 = (np.asarray(a)[sel] == 2).sum()
        assert got2 == 2
        assert len(sel) == 8

    def test_pseudo_sampler_identity(self):
        a = jnp.asarray([0, 1, -1, 2, 0], jnp.int32)
        res = pseudo_sample(a)
        assert np.asarray(res.pos_mask).tolist() == [False, True, False,
                                                     True, False]
        assert np.asarray(res.valid).tolist() == [True, True, False,
                                                  True, True]

    def test_score_hlr_weights_monotone_in_score(self):
        n = 16
        a = np.zeros((n,), np.int32)
        a[0] = 1
        boxes = np.zeros((n, 4), np.float32)
        # non-overlapping negatives -> each its own group; HLR = score rank
        for i in range(n):
            boxes[i] = [i * 20, 0, i * 20 + 10, 10]
        scores = np.linspace(0.9, 0.1, n).astype(np.float32)
        res = score_hlr_sample(jax.random.PRNGKey(0), jnp.asarray(a),
                               jnp.asarray(boxes), jnp.asarray(scores),
                               num=8, pos_fraction=0.25)
        w = np.asarray(res.neg_label_weights)
        sel = np.asarray(res.sample.inds)
        neg_slots = np.asarray(res.sample.valid & ~res.sample.is_pos)
        # higher-score negatives must carry >= weight than lower-score ones
        order = np.argsort(-scores[sel[neg_slots]])
        ws = w[neg_slots][order]
        assert (np.diff(ws) <= 1e-6).all()
        assert ws.max() <= 1.0 + 1e-6


class TestBucketingCoder:
    def test_roundtrip_recovers_gt(self):
        proposals = jnp.asarray([[10, 10, 110, 90], [0, 0, 64, 64]],
                                jnp.float32)
        gt = jnp.asarray([[14, 12, 104, 88], [2, 4, 60, 62]], jnp.float32)
        offsets, ow, labels, cw = bbox2bucket(proposals, gt, num_buckets=14,
                                              scale_factor=1.7)
        side = 7
        assert offsets.shape == (2, 4 * side)
        # perfect predictions: cls = labels as logits, offsets as targets
        decoded, conf = bucket2bbox(proposals, labels * 20.0, offsets,
                                    num_buckets=14, scale_factor=1.7)
        np.testing.assert_allclose(np.asarray(decoded), np.asarray(gt),
                                   atol=1e-3)
        assert (np.asarray(conf) > 0.5).all()

    def test_weights_mark_topk(self):
        proposals = jnp.asarray([[0, 0, 56, 56]], jnp.float32)
        gt = jnp.asarray([[0, 0, 56, 56]], jnp.float32)
        _, ow, labels, cw = bbox2bucket(proposals, gt, num_buckets=14,
                                        scale_factor=1.0, offset_topk=2)
        # exactly 2 offset weights per side can be active at most
        ow = np.asarray(ow).reshape(4, 7)
        assert (ow.sum(-1) <= 2 + 1e-6).all()
        labels = np.asarray(labels).reshape(4, 7)
        assert (labels.sum(-1) == 1).all()


class TestLegacyCoder:
    def test_against_torch_golden(self):
        torch = pytest.importorskip('torch')
        rois = np.array([[0., 0., 1., 1.], [0., 0., 1., 1.],
                         [0., 0., 1., 1.], [5., 5., 5., 5.]], np.float32)
        gts = np.array([[0., 0., 1., 1.], [.1, .1, 1.2, 1.3],
                        [0., 0., 2., 2.], [5., 5., 6., 7.]], np.float32)

        # transcription of legacy_bbox2delta (float64 golden)
        p, g = rois.astype(np.float64), gts.astype(np.float64)
        px, py = (p[:, 0] + p[:, 2]) * .5, (p[:, 1] + p[:, 3]) * .5
        pw, ph = p[:, 2] - p[:, 0] + 1, p[:, 3] - p[:, 1] + 1
        gx, gy = (g[:, 0] + g[:, 2]) * .5, (g[:, 1] + g[:, 3]) * .5
        gw, gh = g[:, 2] - g[:, 0] + 1, g[:, 3] - g[:, 1] + 1
        golden = np.stack([(gx - px) / pw, (gy - py) / ph,
                           np.log(gw / pw), np.log(gh / ph)], -1)

        ours = np.asarray(legacy_bbox2delta(jnp.asarray(rois),
                                            jnp.asarray(gts)))
        np.testing.assert_allclose(ours, golden, atol=1e-5)

        # decode must invert encode (legacy corner convention)
        dec = np.asarray(legacy_delta2bbox(jnp.asarray(rois),
                                           jnp.asarray(ours)))
        np.testing.assert_allclose(dec, gts, atol=1e-4)

    def test_rescale(self):
        b = jnp.asarray([[10., 10., 30., 30.]])
        r = np.asarray(bbox_rescale(b, 2.0))
        np.testing.assert_allclose(r, [[0., 0., 40., 40.]])
