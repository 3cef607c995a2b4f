"""Assigner/sampler semantics vs the reference MaxIoUAssigner/RandomSampler."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
    max_iou_assign, random_sample)


def _pad_gts(gts, labels, max_gt=8):
    g = np.zeros((max_gt, 4), np.float32)
    l = np.zeros((max_gt,), np.int32)
    v = np.zeros((max_gt,), bool)
    if len(gts):
        g[:len(gts)] = gts
        l[:len(labels)] = labels
    v[:len(gts)] = True
    return jnp.asarray(g), jnp.asarray(l), jnp.asarray(v)


def test_assign_pos_neg_ignore():
    priors = jnp.array([
        [0, 0, 10, 10],     # iou 1.0 with gt0 -> pos
        [0, 0, 20, 20],     # iou 0.25 with gt0 -> ignore band [0.3? no 0.25<0.3 -> neg]
        [100, 100, 110, 110],  # iou 0 -> neg
        [0, 0, 12, 12],     # iou ~0.69 -> in (0.3, 0.7) -> ignored (-1)
    ], jnp.float32)
    g, l, v = _pad_gts([[0, 0, 10, 10]], [2])
    res = max_iou_assign(priors, g, v, l, pos_iou_thr=0.7, neg_iou_thr=0.3,
                         min_pos_iou=0.3, match_low_quality=False)
    assigned = np.asarray(res.assigned_gt_inds)
    assert assigned[0] == 1
    assert assigned[1] == 0
    assert assigned[2] == 0
    assert assigned[3] == -1
    assert np.asarray(res.labels)[0] == 2


def test_assign_low_quality_match():
    # no prior reaches pos_iou_thr for gt, but low-quality match claims best
    priors = jnp.array([[0, 0, 8, 8], [50, 50, 60, 60]], jnp.float32)
    g, l, v = _pad_gts([[0, 0, 16, 16]], [0])
    res = max_iou_assign(priors, g, v, l, pos_iou_thr=0.9, neg_iou_thr=0.2,
                         min_pos_iou=0.2, match_low_quality=True)
    assigned = np.asarray(res.assigned_gt_inds)
    assert assigned[0] == 1  # claimed by gt despite iou < pos_thr
    assert assigned[1] == 0


def test_assign_no_gt_all_negative():
    priors = jnp.array([[0, 0, 10, 10]], jnp.float32)
    g, l, v = _pad_gts([], [])
    res = max_iou_assign(priors, g, v, l)
    assert np.asarray(res.assigned_gt_inds)[0] == 0


def test_assign_prior_valid_mask():
    priors = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    g, l, v = _pad_gts([[0, 0, 10, 10]], [0])
    res = max_iou_assign(priors, g, v, l,
                         prior_valid=jnp.array([True, False]))
    assigned = np.asarray(res.assigned_gt_inds)
    assert assigned[0] == 1 and assigned[1] == -1


def test_random_sample_quotas():
    rng = jax.random.PRNGKey(0)
    # 10 pos, 500 neg, 20 ignored
    assigned = jnp.concatenate([
        jnp.full((10,), 1), jnp.zeros((500,), jnp.int32),
        jnp.full((20,), -1)]).astype(jnp.int32)
    res = random_sample(rng, assigned, num=256, pos_fraction=0.5)
    is_pos = np.asarray(res.is_pos)
    valid = np.asarray(res.valid)
    assert valid.sum() == 256
    assert is_pos[valid].sum() == 10  # all positives kept (fewer than 128)
    # negatives fill the remainder
    assert (~is_pos[valid]).sum() == 246
    # ignored never sampled
    sampled = np.asarray(res.inds)[valid]
    assert np.all(np.asarray(assigned)[sampled] >= 0)


def test_random_sample_pos_cap():
    rng = jax.random.PRNGKey(1)
    assigned = jnp.concatenate([
        jnp.full((300,), 1), jnp.zeros((300,), jnp.int32)]).astype(jnp.int32)
    res = random_sample(rng, assigned, num=256, pos_fraction=0.25)
    valid = np.asarray(res.valid)
    is_pos = np.asarray(res.is_pos)
    assert valid.sum() == 256
    assert is_pos[valid].sum() == 64  # exactly num * pos_fraction


def test_random_sample_not_enough_total():
    rng = jax.random.PRNGKey(2)
    assigned = jnp.array([1, 0, 0, -1], jnp.int32)
    res = random_sample(rng, assigned, num=8, pos_fraction=0.5)
    valid = np.asarray(res.valid)
    assert valid.sum() == 3  # 1 pos + 2 neg available


def test_atss_assign_basic():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import atss_assign
    # 2 levels of a tiny grid; one gt centered on anchor 0 of level 0
    anchors = jnp.array([
        [0., 0., 16., 16.], [16., 0., 32., 16.],     # level 0
        [0., 0., 32., 32.], [32., 0., 64., 32.],     # level 1
    ])
    g, l_, v = jnp.array([[2., 2., 14., 14.]]), jnp.array([1]), jnp.array([True])
    res = atss_assign(anchors, (2, 2), g, v, l_, topk=1)
    a = np.asarray(res.assigned_gt_inds)
    assert a[0] == 1          # the overlapping small anchor is positive
    assert np.asarray(res.labels)[0] == 1
    # empty gt → all background
    res2 = atss_assign(anchors, (2, 2), g, jnp.array([False]), l_, topk=1)
    assert np.asarray(res2.assigned_gt_inds).max() == 0


def test_ohem_sample_picks_hardest():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox.samplers import (
        ohem_sample)
    assigned = jnp.array([1, 1, 1, 0, 0, 0, 0, -1], jnp.int32)
    loss = jnp.array([0.1, 0.9, 0.5, 0.2, 0.8, 0.3, 0.7, 99.0])
    res = ohem_sample(assigned, loss, num=4, pos_fraction=0.5)
    sel = set(np.asarray(res.inds)[np.asarray(res.valid)].tolist())
    # 2 hardest positives (1, 2) and 2 hardest negatives (4, 6)
    assert sel == {1, 2, 4, 6}


def test_sample_rois_ohem_selects_hardest_negatives():
    """Model-level OHEM (reference OHEMSampler via
    `train_cfg.rcnn.sampler.type='OHEMSampler'`): sample_rois with a
    score_fn must pick the highest-loss negatives, not random ones."""
    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
        RoITrainConfig, sample_rois)

    # one gt far away from all proposals -> all proposals are negatives
    gt = jnp.array([[[0., 0., 10., 10.]]])
    gtl = jnp.array([[0]])
    gtv = jnp.array([[True]])
    n = 16
    props = jnp.stack([jnp.array([100. + 12 * i, 100., 110. + 12 * i, 110.])
                       for i in range(n)])[None]
    pv = jnp.ones((1, n), bool)
    num_classes = 3

    # score_fn: candidate i gets logits that make its bg CE loss grow with
    # i (higher confidence on a WRONG class). cands = [gt | props].
    def score_fn(cands):
        m = cands.shape[1]
        idx = jnp.arange(m, dtype=jnp.float32)
        logits = jnp.zeros((1, m, num_classes + 1))
        return logits.at[:, :, 0].set(idx * 0.5)  # wrong class conf rises

    cfg = RoITrainConfig(num_samples=4, pos_fraction=0.5,
                         use_sigmoid_cls=False, sampler_type='ohem',
                         add_gt_as_proposals=True)
    out = sample_rois(props, pv, gt, gtl, gtv, jax.random.PRNGKey(0),
                      num_classes, cfg, score_fn=score_fn)
    # 1 positive (the gt itself, index 0) + 3 hardest negatives = the
    # LAST three proposals (highest wrong-class confidence)
    sel_x1 = sorted(float(x) for x in out.rois[0, :, 0]
                    if float(x) >= 100.)  # negatives only
    expect = sorted(100. + 12 * i for i in range(n - 3, n))
    assert sel_x1 == expect, (sel_x1, expect)
    assert bool(jnp.any(out.is_pos[0]))


def test_sample_rois_ohem_matches_random_interface():
    """OHEM and random sampling return identical structure/shapes."""
    import jax
    import jax.numpy as jnp
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.roi_heads.standard_roi_head import (
        RoITrainConfig, sample_rois)
    gt = jnp.array([[[5., 5., 30., 30.], [40., 40., 60., 60.]]])
    gtl = jnp.array([[1, 2]])
    gtv = jnp.array([[True, True]])
    props = jnp.array([[[4., 4., 31., 29.], [41., 39., 59., 61.],
                        [80., 80., 95., 95.], [0., 0., 3., 3.]]])
    pv = jnp.ones((1, 4), bool)
    score_fn = lambda c: jnp.zeros((1, c.shape[1], 4))
    a = sample_rois(props, pv, gt, gtl, gtv, jax.random.PRNGKey(0), 3,
                    RoITrainConfig(num_samples=6, use_sigmoid_cls=False))
    b = sample_rois(props, pv, gt, gtl, gtv, jax.random.PRNGKey(0), 3,
                    RoITrainConfig(num_samples=6, use_sigmoid_cls=False,
                                   sampler_type='ohem'), score_fn=score_fn)
    for x, y in zip(a, b):
        assert x.shape == y.shape
