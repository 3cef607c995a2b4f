"""DeformConv2d vs a naive transcription of the torchvision/mmcv algorithm
(`torchvision.ops.deform_conv2d` semantics; reference consumers:
`mmdet/models/dense_heads/vfnet_head.py`, `reppoints_head.py`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops import (
    deform_conv2d)


def _sample(img, y, x):
    """Bilinear with zero padding (torchvision deform_conv2d convention)."""
    h, w = img.shape[:2]
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = np.zeros(img.shape[2:], np.float64)
    for yi, wy in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for xi, wx in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yi < h and 0 <= xi < w and wy * wx:
                out += wy * wx * img[yi, xi]
    return out


def deform_conv_golden(x, offsets, weight, stride, padding, dilation,
                       mask=None):
    h, w, c = x.shape
    kh, kw, _, co = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((ho, wo, co), np.float64)
    for oy in range(ho):
        for ox in range(wo):
            acc = np.zeros((k, c), np.float64)
            for ki in range(kh):
                for kj in range(kw):
                    t = ki * kw + kj
                    yy = oy * stride - padding + ki * dilation \
                        + offsets[oy, ox, 2 * t]
                    xx = ox * stride - padding + kj * dilation \
                        + offsets[oy, ox, 2 * t + 1]
                    v = _sample(x, yy, xx)
                    if mask is not None:
                        v = v * mask[oy, ox, t]
                    acc[t] = v
            out[oy, ox] = np.tensordot(acc, weight.reshape(k, c, co),
                                       axes=([0, 1], [0, 1]))
    return out


@pytest.mark.parametrize('stride,dilation', [(1, 1), (2, 1), (1, 2)])
def test_deform_conv_vs_golden(stride, dilation):
    rng = np.random.RandomState(0)
    x = rng.randn(9, 11, 3).astype(np.float32)
    kh = kw = 3
    padding = dilation
    ho = (9 + 2 * padding - dilation * 2 - 1) // stride + 1
    wo = (11 + 2 * padding - dilation * 2 - 1) // stride + 1
    offsets = rng.uniform(-2, 2, (ho, wo, 2 * kh * kw)).astype(np.float32)
    weight = rng.randn(kh, kw, 3, 5).astype(np.float32) * 0.3
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        stride=stride, padding=padding, dilation=dilation))
    want = deform_conv_golden(x.astype(np.float64), offsets, weight,
                              stride, padding, dilation)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_modulated_deform_conv_vs_golden():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 8, 4).astype(np.float32)
    offsets = rng.uniform(-1.5, 1.5, (8, 8, 18)).astype(np.float32)
    msk = rng.uniform(0, 1, (8, 8, 9)).astype(np.float32)
    weight = rng.randn(3, 3, 4, 6).astype(np.float32) * 0.3
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        mask=jnp.asarray(msk)))
    want = deform_conv_golden(x.astype(np.float64), offsets, weight,
                              1, 1, 1, mask=msk)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_zero_offsets_match_plain_conv():
    """Δ=0 must reduce to an ordinary convolution."""
    import jax
    rng = np.random.RandomState(2)
    x = rng.randn(10, 10, 3).astype(np.float32)
    weight = rng.randn(3, 3, 3, 4).astype(np.float32)
    offsets = np.zeros((10, 10, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(weight)))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(weight),
        window_strides=(1, 1), padding=[(1, 1)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)
