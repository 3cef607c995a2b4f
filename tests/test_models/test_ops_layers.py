"""RoIAlign numerical tests (vs a naive reference implementation) and
layer/backbone shape+grad tests (mirrors `tests/test_models/test_backbones`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align import (
    roi_align, batched_roi_align)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.layers.grl import (
    gradient_reverse)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.layers.attention import (
    CBAM, NonLocalBlock, MHSA)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.resnet import (
    ResNet)


def naive_roi_align(feat, roi, scale, out, sr, aligned=True):
    """Straight loop reference of aligned RoIAlign with fixed sampling."""
    h, w, c = feat.shape
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [v * scale for v in roi]
    x1, y1 = x1 - off, y1 - off
    bw, bh = (x2 - x1 - (x2 * 0 )) , 0  # placeholder
    roi_w = (x2 - off) - x1
    roi_h = (y2 - off) - y1
    bin_w, bin_h = roi_w / out, roi_h / out
    res = np.zeros((out, out, c), np.float32)
    for i in range(out):
        for j in range(out):
            acc = np.zeros(c, np.float32)
            for sy in range(sr):
                for sx in range(sr):
                    py = y1 + (i + (sy + 0.5) / sr) * bin_h
                    px = x1 + (j + (sx + 0.5) / sr) * bin_w
                    if py < -1 or py > h or px < -1 or px > w:
                        continue
                    py_c = min(max(py, 0), h - 1)
                    px_c = min(max(px, 0), w - 1)
                    y0, x0 = int(np.floor(py_c)), int(np.floor(px_c))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    fy, fx = py_c - y0, px_c - x0
                    acc += ((1 - fy) * (1 - fx) * feat[y0, x0] +
                            (1 - fy) * fx * feat[y0, x1i] +
                            fy * (1 - fx) * feat[y1i, x0] +
                            fy * fx * feat[y1i, x1i])
            res[i, j] = acc / (sr * sr)
    return res


@pytest.mark.parametrize('seed', [0, 1])
def test_roi_align_matches_naive(seed):
    rng = np.random.RandomState(seed)
    feat = rng.randn(16, 24, 8).astype(np.float32)
    rois = np.array([
        [8., 8., 100., 60.],
        [0., 0., 30., 30.],
        [50., 20., 380., 250.],   # extends past the image
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=1 / 16, out_size=7,
                               sampling_ratio=2))
    for r in range(len(rois)):
        want = naive_roi_align(feat, rois[r], 1 / 16, 7, 2)
        np.testing.assert_allclose(got[r], want, atol=1e-4)


def test_roi_align_batched_and_grad():
    feat = jnp.ones((2, 8, 8, 4))
    rois = jnp.tile(jnp.array([[0., 0., 64., 64.]]), (2, 3, 1))
    out = batched_roi_align(feat, rois, 1 / 8, out_size=7)
    assert out.shape == (2, 3, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)

    def f(x):
        return batched_roi_align(x, rois, 1 / 8).sum()
    g = jax.grad(f)(feat)
    assert np.all(np.isfinite(np.asarray(g)))


def test_roi_align_flatten_matches_5d():
    """flatten=True must equal the X-MAJOR (xbin, ybin, C) reshape of
    flatten=False in value AND grad — it only moves the repack into the
    scan body (flatten order note in ops/roi_align.py)."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    rois = jnp.asarray(rng.rand(2, 5, 2, 2).cumsum(2).reshape(2, 5, 4)
                       * 16, jnp.float32)
    full = batched_roi_align(feat, rois, 1 / 4, out_size=7, roi_chunk=2)
    flat = batched_roi_align(feat, rois, 1 / 4, out_size=7, roi_chunk=2,
                             flatten=True)
    assert flat.shape == (2, 5, 7 * 7 * 6)
    xmajor = np.swapaxes(np.asarray(full), 2, 3).reshape(2, 5, -1)
    np.testing.assert_allclose(np.asarray(flat), xmajor, atol=1e-6)
    w = jnp.asarray(rng.randn(2, 5, 7, 7, 6), jnp.float32)
    w_flat = jnp.swapaxes(w, 2, 3).reshape(2, 5, -1)
    g_full = jax.grad(lambda x: jnp.sum(
        batched_roi_align(x, rois, 1 / 4, out_size=7, roi_chunk=2)
        * w))(feat)
    g_flat = jax.grad(lambda x: jnp.sum(
        batched_roi_align(x, rois, 1 / 4, out_size=7, roi_chunk=2,
                          flatten=True) * w_flat))(feat)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_full),
                               atol=1e-5)


def test_gradient_reverse():
    def f(x):
        return jnp.sum(gradient_reverse(x, -1.0)**1) * 3.0
    g = jax.grad(f)(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(g), -3.0)
    # forward is identity
    np.testing.assert_allclose(
        np.asarray(gradient_reverse(jnp.arange(3.0))), [0, 1, 2])


def test_attention_blocks_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 8, 8, 32))
    cbam = CBAM(channels=32, reduction=4)
    v = cbam.init(key, x)
    assert cbam.apply(v, x).shape == x.shape

    tokens = jnp.ones((5, 16))
    nlb = NonLocalBlock(channels=16)
    v = nlb.init(key, tokens)
    assert nlb.apply(v, tokens).shape == tokens.shape

    mhsa = MHSA(channels=32, num_heads=4)
    v = mhsa.init(key, x[0])
    assert mhsa.apply(v, x[0]).shape == (8, 8, 32)


def test_resnet50_dc5_shapes():
    model = ResNet(depth=50, strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                   out_indices=(3,), frozen_stages=1)
    x = jnp.ones((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    (out,) = model.apply(vars_, x)
    # stride 16 with dilated stage 4: 64/16=4, 96/16=6, 2048 channels
    assert out.shape == (1, 4, 6, 2048)
    assert model.stage_channels() == (256, 512, 1024, 2048)


def test_resnet18_fpn_shapes():
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    x = jnp.ones((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_resnet_frozen_stage_stops_grad():
    model = ResNet(depth=18, out_indices=(3,), frozen_stages=1)
    x = jnp.ones((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        (out,) = model.apply({'params': params,
                              'batch_stats': vars_['batch_stats']}, x)
        return jnp.sum(out**2)

    g = jax.grad(loss)(vars_['params'])
    flat = jax.tree_util.tree_leaves_with_path(g)
    froz = [np.abs(np.asarray(v)).max() for p, v in flat
            if 'conv1' == jax.tree_util.keystr(p).split("'")[1] or
            'layer1' in jax.tree_util.keystr(p)]
    live = [np.abs(np.asarray(v)).max() for p, v in flat
            if 'layer4' in jax.tree_util.keystr(p)]
    assert max(froz) == 0.0
    assert max(live) > 0.0


def test_roi_align_pallas_matches_xla():
    """Pallas kernel (interpret mode on CPU) vs the XLA separable path."""
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops.roi_align_pallas import (
        roi_align_pallas)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(2, 16, 24, 128), jnp.float32)
    rois = rng.uniform(0, 200, (2, 40, 4)).astype(np.float32)
    rois[..., 2:] += rois[..., :2] + 40
    rois = jnp.asarray(rois)
    ref = batched_roi_align(feat, rois, 1 / 16)
    got = roi_align_pallas(feat, rois, 1 / 16, roi_chunk=16, c_slab=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_resnext_mobilenet_darknet_pafpn():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones import (
        ResNet, MobileNetV2, Darknet53)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.necks import PAFPN
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 64, 64, 3))
    # ResNeXt-50 32x4d
    rx = ResNet(depth=50, groups=32, base_width=4, out_indices=(3,))
    v = rx.init(key, x)
    (out,) = rx.apply(v, x)
    assert out.shape == (1, 2, 2, 2048)
    # MobileNetV2
    mb = MobileNetV2()
    v = mb.init(key, x)
    outs = mb.apply(v, x)
    assert [o.shape[-1] for o in outs] == [24, 32, 96, 320]
    assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2
    # Darknet53
    dk = Darknet53()
    v = dk.init(key, x)
    outs = dk.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024]
    # PAFPN over resnet stages
    feats = tuple(jnp.ones((1, 64 // s, 64 // s, c)) for s, c in
                  [(4, 256), (8, 512), (16, 1024), (32, 2048)])
    neck = PAFPN()
    v = neck.init(key, feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert all(o.shape[-1] == 256 for o in outs)


def test_extra_losses():
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.losses import (
        balanced_l1_loss, gaussian_focal_loss)
    pred = jnp.array([0.5, 2.0])
    tgt = jnp.zeros((2,))
    out = balanced_l1_loss(pred, tgt, reduction='none')
    assert np.all(np.isfinite(np.asarray(out))) and float(out[1]) > float(out[0])
    p = jnp.array([[0.9, 0.1]])
    t = jnp.array([[1.0, 0.0]])
    g = gaussian_focal_loss(p, t, reduction='none')
    assert np.all(np.asarray(g) >= 0)
