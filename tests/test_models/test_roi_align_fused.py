"""Fused Pallas RoIAlign (v2, batched-RoI) vs the XLA separable path —
interpret mode so semantics are checked exactly on CPU."""
import jax
import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (
    batched_roi_align)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
    roi_align_fused)


def _data():
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, 16, 24, 8), jnp.float32)
    rois = jnp.asarray([[[4., 8., 100., 60.], [0., 0., 300., 200.],
                         [50., 20., 51., 22.]]] * 2)
    return feats, rois


def test_fused_fwd_matches_xla():
    feats, rois = _data()
    ref = batched_roi_align(feats, rois, 1 / 16.)
    got = roi_align_fused(feats, rois, 1 / 16., 7, 2, True, 64, 8, True)
    assert float(jnp.abs(ref - got).max()) < 1e-5


def test_fused_bwd_matches_xla():
    feats, rois = _data()
    g_ref = jax.grad(lambda x: jnp.sum(
        batched_roi_align(x, rois, 1 / 16.) ** 2))(feats)
    g_got = jax.grad(lambda x: jnp.sum(
        roi_align_fused(x, rois, 1 / 16., 7, 2, True, 64, 8, True) ** 2))(
        feats)
    assert float(jnp.abs(g_ref - g_got).max()) < 1e-4


def test_fused_roi_grad_is_zero():
    """RoIs are non-differentiable by design (proposals are detached on
    every caller path) — the custom VJP returns a zero cotangent."""
    feats, rois = _data()
    g = jax.grad(lambda r: jnp.sum(
        roi_align_fused(feats, r, 1 / 16., 7, 2, True, 64, 8, True)))(rois)
    assert float(jnp.abs(g).max()) == 0.0


def test_fused_v3_fwd_bwd_matches_xla():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_fused_v3)
    feats, rois = _data()
    ref = batched_roi_align(feats, rois, 1 / 16.)
    got = roi_align_fused_v3(feats, rois, 1 / 16., 7, 2, True, 64, 8, True)
    assert float(jnp.abs(ref - got).max()) < 1e-5
    g_ref = jax.grad(lambda x: jnp.sum(
        batched_roi_align(x, rois, 1 / 16.) ** 2))(feats)
    g_got = jax.grad(lambda x: jnp.sum(
        roi_align_fused_v3(x, rois, 1 / 16., 7, 2, True, 64, 8, True) ** 2))(
        feats)
    assert float(jnp.abs(g_ref - g_got).max()) < 1e-4


def test_fused_v4_fwd_bwd_matches_xla():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_fused_v4)
    feats, rois = _data()
    ref = batched_roi_align(feats, rois, 1 / 16.)
    got = roi_align_fused_v4(feats, rois, 1 / 16., 7, 2, True, 2, 8, True)
    assert float(jnp.abs(ref - got).max()) < 1e-5
    g_ref = jax.grad(lambda x: jnp.sum(
        batched_roi_align(x, rois, 1 / 16.) ** 2))(feats)
    g_got = jax.grad(lambda x: jnp.sum(
        roi_align_fused_v4(x, rois, 1 / 16., 7, 2, True, 2, 8, True) ** 2))(
        feats)
    assert float(jnp.abs(g_ref - g_got).max()) < 1e-4
