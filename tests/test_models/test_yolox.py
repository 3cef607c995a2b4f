"""YOLOX family: SimOTA assigner semantics + detector train/test forward
(reference `mmdet/models/detectors/yolox.py`, `sim_ota_assigner.py:10`)."""

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.core.bbox import (
    sim_ota_assign)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
    YOLOX)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.yolox import (
    yolox_decode, yolox_priors)


def _priors_grid(h=8, w=8, stride=8):
    return jnp.asarray(yolox_priors([(h, w)], [stride]))


def test_sim_ota_assigns_center_priors():
    priors = _priors_grid()
    n = priors.shape[0]
    off = jnp.concatenate([priors[:, :2] + priors[:, 2:] * 0.5,
                           priors[:, 2:]], -1)
    # one gt box centered at (24, 24); predictions = priors decoded as
    # perfect boxes around each cell
    gt = jnp.asarray([[8., 8., 40., 40.], [0., 0., 0., 0.]])
    gt_labels = jnp.asarray([1, 0], jnp.int32)
    gt_valid = jnp.asarray([True, False])
    # decoded boxes: a 16×16 box at each prior center
    ctr = off[:, :2]
    decoded = jnp.concatenate([ctr - 8, ctr + 8], -1)
    scores = jnp.full((n, 3), 0.5)
    res = sim_ota_assign(scores, off, decoded, gt, gt_labels, gt_valid)
    fg = np.asarray(res.fg_mask)
    assert fg.sum() > 0
    # all positives match gt 0 (the only valid one)
    assert np.all(np.asarray(res.matched_gt)[fg] == 0)
    # positives lie inside the gt box
    pos_ctr = np.asarray(ctr)[fg]
    assert np.all((pos_ctr > 7) & (pos_ctr < 41))
    # padded gt attracted nothing even though every prior "overlaps" it
    assert np.all(np.asarray(res.matched_iou)[fg] > 0)


def test_sim_ota_dynamic_k_caps_matches():
    """With a tiny gt and low ious, dynamic-k clamps to 1 — exactly one
    prior matches."""
    priors = _priors_grid()
    off = jnp.concatenate([priors[:, :2] + priors[:, 2:] * 0.5,
                           priors[:, 2:]], -1)
    gt = jnp.asarray([[30., 30., 34., 34.]])
    gt_valid = jnp.asarray([True])
    ctr = off[:, :2]
    decoded = jnp.concatenate([ctr - 16, ctr + 16], -1)   # poor IoU ≈ 0.016
    scores = jnp.full((off.shape[0], 2), 0.5)
    res = sim_ota_assign(scores, off, decoded, gt, jnp.asarray([0]), gt_valid)
    assert int(np.asarray(res.fg_mask).sum()) == 1


def test_yolox_decode_roundtrip():
    priors = _priors_grid()
    reg = jnp.asarray(np.random.RandomState(0).randn(priors.shape[0], 4),
                      jnp.float32)
    boxes = yolox_decode(priors, reg)
    wh = boxes[:, 2:] - boxes[:, :2]
    assert np.all(np.asarray(wh) > 0)
    ctr = (boxes[:, :2] + boxes[:, 2:]) * 0.5
    np.testing.assert_allclose(
        np.asarray(ctr),
        np.asarray(reg[:, :2] * priors[:, 2:] + priors[:, :2]), rtol=1e-5)


def _yolox_batch(b=2, h=64, w=64, g=6, nc=3, seed=0):
    rng = np.random.RandomState(seed)
    boxes = rng.uniform(0, h // 2, (b, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2] + 8
    return dict(
        image=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        img_shape=jnp.asarray([[h, w]] * b, jnp.int32),
        gt_bboxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, nc, (b, g)), jnp.int32),
        gt_valid=jnp.asarray(np.arange(g)[None] < 3 + np.zeros((b, 1))))


def test_yolox_train_and_test_forward():
    model = YOLOX(num_classes=3, deepen_factor=0.33, widen_factor=0.25,
                  use_l1=True)
    batch = _yolox_batch()
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k}, batch, train=True)
    losses, _ = model.apply(variables, batch, train=True,
                            mutable=['batch_stats'])
    assert set(losses) == {'loss_cls', 'loss_obj', 'loss_bbox', 'loss_l1'}
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    # grads flow and batch_stats update
    def total(params):
        out, _ = model.apply({'params': params,
                              'batch_stats': variables['batch_stats']},
                             batch, train=True, mutable=['batch_stats'])
        return sum(out.values())
    g = jax.grad(total)(variables['params'])
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0

    dets = model.apply(variables, batch, train=False)
    assert dets['dets'].shape == (2, 100, 5)
    assert dets['labels'].shape == (2, 100)
    assert np.isfinite(np.asarray(dets['dets'])).all()
