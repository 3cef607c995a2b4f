"""Loss golden tests (mirrors `tests/test_metrics/test_losses.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses import (
    cross_entropy, binary_cross_entropy, smooth_l1_loss, sigmoid_focal_loss,
    giou_loss, accuracy, CrossEntropyLoss, SmoothL1Loss, FocalLoss)


def test_cross_entropy_value():
    logits = jnp.array([[10., 0.], [0., 10.]])
    labels = jnp.array([0, 1])
    loss = float(cross_entropy(logits, labels))
    assert loss == pytest.approx(0.0, abs=1e-3)
    loss_wrong = float(cross_entropy(logits, jnp.array([1, 0])))
    assert loss_wrong == pytest.approx(10.0, abs=1e-3)


def test_binary_cross_entropy_onehot_expansion():
    logits = jnp.array([[100., -100.]])
    # label == num_classes means background → all-zero row
    loss_bg = float(binary_cross_entropy(logits, jnp.array([2])))
    loss_fg = float(binary_cross_entropy(logits, jnp.array([0])))
    assert loss_fg == pytest.approx(0.0, abs=1e-3)
    assert loss_bg == pytest.approx(50.0, abs=1e-2)  # mean over 2 cols


def test_smooth_l1():
    pred = jnp.array([0., 2.])
    target = jnp.array([0.5, 0.])
    loss = np.asarray(smooth_l1_loss(pred, target, reduction='none', beta=1.0))
    np.testing.assert_allclose(loss, [0.125, 1.5], atol=1e-6)


def test_focal_loss_down_weights_easy():
    logits = jnp.array([[5.0], [0.0]])
    labels = jnp.array([0, 0])
    loss = np.asarray(sigmoid_focal_loss(logits, labels, reduction='none'))
    assert loss[0, 0] < loss[1, 0]  # confident correct → tiny loss


def test_weighted_avg_factor():
    logits = jnp.array([[10., 0.], [10., 0.]])
    labels = jnp.array([0, 0])
    w = jnp.array([1.0, 0.0])
    loss = float(cross_entropy(logits, labels, weight=w, avg_factor=1.0))
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_giou_perfect():
    b = jnp.array([[0., 0., 10., 10.]])
    assert float(giou_loss(b, b)) == pytest.approx(0.0, abs=1e-5)


def test_accuracy():
    logits = jnp.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    labels = jnp.array([0, 1, 1])
    assert float(accuracy(logits, labels)) == pytest.approx(100 * 2 / 3)


def test_config_driven_losses():
    ce = CrossEntropyLoss(use_sigmoid=True, loss_weight=2.0)
    sl1 = SmoothL1Loss(beta=1.0, loss_weight=1.0)
    fl = FocalLoss()
    logits = jnp.zeros((4, 3))
    labels = jnp.array([0, 1, 2, 3])  # 3 == background
    assert np.isfinite(float(ce(logits, labels)))
    assert np.isfinite(float(fl(logits, labels)))
    assert float(sl1(jnp.zeros((4,)), jnp.zeros((4,)))) == 0.0


def test_losses_differentiable():
    def f(x):
        return cross_entropy(x, jnp.array([0]))
    g = jax.grad(f)(jnp.array([[1.0, 2.0]]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ghm_loss_finite_and_weighted():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses.focal_loss import (
        ghm_classification_loss)
    logits = jnp.array([[5.0, -5.0], [0.0, 0.0], [-5.0, 5.0]])
    labels = jnp.array([0, 0, 2])     # 2 == background (all-zero row)
    valid = jnp.array([True, True, True])
    out = float(ghm_classification_loss(logits, labels, valid, bins=5))
    assert np.isfinite(out) and out > 0


def test_gfl_and_varifocal_losses():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses import (
        quality_focal_loss, distribution_focal_loss, varifocal_loss)
    logits = jnp.zeros((4, 3))
    labels = jnp.array([0, 1, 2, 3])  # 3 == bg
    quality = jnp.array([0.9, 0.5, 0.7, 0.0])
    q = float(quality_focal_loss(logits, labels, quality))
    assert np.isfinite(q) and q > 0
    # DFL: confident distribution at the right bin → low loss
    d_logits = jnp.array([[10., 0., 0.], [0., 10., 0.]])
    t = jnp.array([0.0, 1.0])
    d = distribution_focal_loss(d_logits, t, reduction='none')
    assert float(d.max()) < 0.01
    t_mid = jnp.array([0.5, 1.5])
    d_mid = distribution_focal_loss(d_logits, t_mid, reduction='none')
    assert float(d_mid.min()) > float(d.max())
    # VFL
    targets = jnp.zeros((4, 3)).at[0, 0].set(0.9)
    v = float(varifocal_loss(logits, targets))
    assert np.isfinite(v) and v > 0
