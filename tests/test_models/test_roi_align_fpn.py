"""Multi-level (FPN) RoIAlign paths agree: the dense separable default
(`batched_roi_align_fpn`), the point-gather probe
(`batched_roi_align_pyramid`), and the fused Pallas kernel
(`roi_align_fpn_fused`, interpret mode) — all implement the reference
`single_level_roi_extractor.py:10` map_roi_levels semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (
    batched_roi_align_fpn, batched_roi_align_pyramid)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
    roi_align_fpn_fused)

STRIDES = (4, 8, 16, 32)


def _data(b=2, r=37, c=128, h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    feats = tuple(jnp.asarray(rng.randn(b, h // s, w // s, c), jnp.float32)
                  for s in STRIDES)
    rois = rng.uniform(0, 60, (b, r, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(4, 80, (b, r, 2))
    return feats, jnp.asarray(rois)


def test_fpn_dense_matches_pyramid_gather():
    feats, rois = _data()
    a = batched_roi_align_fpn(list(feats), rois, STRIDES, roi_chunk=16)
    b = batched_roi_align_pyramid(list(feats), rois, STRIDES)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_fpn_fused_fwd_matches_dense():
    feats, rois = _data()
    ref = batched_roi_align_fpn(list(feats), rois, STRIDES, roi_chunk=16)
    got = roi_align_fpn_fused(feats, rois, STRIDES, 7, 2, True, 56, 16, 8,
                              True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-4


def test_fpn_fused_bwd_matches_dense():
    feats, rois = _data()
    g_ref = jax.grad(lambda fs: jnp.sum(
        batched_roi_align_fpn(list(fs), rois, STRIDES) ** 2))(feats)
    g_got = jax.grad(lambda fs: jnp.sum(
        roi_align_fpn_fused(fs, rois, STRIDES, 7, 2, True, 56, 16, 8,
                            True) ** 2))(feats)
    for a, b in zip(g_ref, g_got):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-3


def test_fpn_fused_roi_grad_is_zero():
    feats, rois = _data()
    g = jax.grad(lambda r: jnp.sum(
        roi_align_fpn_fused(feats, r, STRIDES, 7, 2, True, 56, 16, 8,
                            True)), argnums=0)(rois)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_fpn_fused_mask_out_size():
    """out_size=14 (mask-head path) uses the reduced roi chunk."""
    feats, rois = _data(r=9)
    ref = batched_roi_align_fpn(list(feats), rois, STRIDES, out_size=14,
                                roi_chunk=8)
    got = roi_align_fpn_fused(feats, rois, STRIDES, 14, 2, True, 56, 16, 8,
                              True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-4


def test_fpn_fused_v2_fwd_matches_dense():
    """v2 (lane-legal r5 redesign) numerics == dense separable path.
    f32 note: out-of-image roi corners can sit on floor() boundaries where
    1-ulp position differences between compilations flip a bilinear
    weight; the f64 check in the r5 closure showed 1.2e-7 agreement, so
    the f32 tolerance here is rounding, not algorithm."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_fpn_fused_v2)
    feats, rois = _data()
    ref = batched_roi_align_fpn(list(feats), rois, STRIDES, roi_chunk=16)
    got = roi_align_fpn_fused_v2(feats, rois, STRIDES, 7, 2, True, 56, 16,
                                 8, True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-4


def test_fpn_fused_v2_bwd_matches_dense():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_fpn_fused_v2)
    feats, rois = _data()
    g_ref = jax.grad(lambda fs: jnp.sum(
        batched_roi_align_fpn(list(fs), rois, STRIDES) ** 2))(feats)
    g_got = jax.grad(lambda fs: jnp.sum(
        roi_align_fpn_fused_v2(fs, rois, STRIDES, 7, 2, True, 56, 16, 8,
                               True) ** 2))(feats)
    for a, b in zip(g_ref, g_got):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-3


def test_fpn_fused_v2_five_level_neck_grads():
    """FPN necks emit 5 levels; the extractor consumes 4 — the bwd must
    return a 5-tuple with zero cotangent for the unused level (the r5
    step-integration bug found by the bench.py A/B)."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_fpn_fused_v2)
    feats, rois = _data()
    feats5 = feats + (jnp.zeros((feats[0].shape[0], 2, 3,
                                 feats[0].shape[-1]), jnp.float32),)
    g = jax.grad(lambda fs: jnp.sum(
        roi_align_fpn_fused_v2(fs, rois, STRIDES, 7, 2, True, 56, 16, 8,
                               True)))(feats5)
    assert len(g) == 5
    assert float(jnp.abs(g[4]).max()) == 0.0
    assert float(jnp.abs(g[0]).max()) > 0.0
