"""Torch-golden parity for the second-wave ops (SURVEY §2.6).

- roi_pool vs torchvision.ops.roi_pool
- point_sample vs F.grid_sample(align_corners=False)
- corner_pool vs directional running-max golden
- ms_deform_attn_core vs the pure-torch transcription that mmcv ships as
  the CPU fallback (`multi_scale_deformable_attn_pytorch`)
- carafe vs a direct nested-loop numpy evaluation
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from unsupervised_domain_adaptation_object_detection_implementation_tpu.ops import (
    roi_pool, corner_pool, point_sample, ms_deform_attn_core, carafe,
    masked_conv2d, resize_to, sum_cell, global_pooling_cell)


def _roi_pool_golden(feat, rois, out_size, scale):
    """Transcription of the legacy RoIPool kernel
    (torchvision `roi_pool_kernel.cpp` / Fast R-CNN caffe original):
    rounded corners, +1 extent, floor/ceil bin edges, empty bins read 0."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), out_size, out_size, c), feat.dtype)
    for ri, roi in enumerate(rois):
        sw, sh = round(roi[0] * scale), round(roi[1] * scale)
        ew, eh = round(roi[2] * scale), round(roi[3] * scale)
        rw, rh = max(ew - sw + 1, 1), max(eh - sh + 1, 1)
        bw, bh = rw / out_size, rh / out_size
        for phh in range(out_size):
            for pww in range(out_size):
                h0 = min(max(int(np.floor(phh * bh)) + sh, 0), h)
                h1 = min(max(int(np.ceil((phh + 1) * bh)) + sh, 0), h)
                w0 = min(max(int(np.floor(pww * bw)) + sw, 0), w)
                w1 = min(max(int(np.ceil((pww + 1) * bw)) + sw, 0), w)
                if h1 > h0 and w1 > w0:
                    out[ri, phh, pww] = feat[h0:h1, w0:w1].max(axis=(0, 1))
    return out


class TestRoIPoolParity:
    @pytest.mark.parametrize('scale', [1.0, 0.5])
    def test_vs_kernel_transcription(self, scale):
        rs = np.random.RandomState(0)
        feat = rs.rand(24, 32, 5).astype(np.float32)
        rois = np.array([[0, 0, 20, 16], [4, 4, 30, 22], [7, 3, 8.6, 5.2],
                         [0, 0, 63, 47]], np.float32)
        gold = _roi_pool_golden(feat, rois, 7, scale)
        ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                   jnp.ones((4,), bool), out_size=7,
                                   spatial_scale=scale, samples=16))
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_invalid_rois_zero(self):
        feat = jnp.ones((8, 8, 2))
        rois = jnp.asarray([[0, 0, 8, 8]], jnp.float32)
        out = roi_pool(feat, rois, jnp.zeros((1,), bool))
        assert float(jnp.abs(out).max()) == 0.0


class TestPointSampleParity:
    def test_vs_grid_sample(self):
        rs = np.random.RandomState(1)
        feat = rs.rand(9, 13, 4).astype(np.float32)
        pts = rs.rand(37, 2).astype(np.float32)   # normalized [0,1]
        grid = torch.from_numpy((pts * 2 - 1)[None, None])   # (1,1,P,2)
        gold = torch.nn.functional.grid_sample(
            torch.from_numpy(feat.transpose(2, 0, 1))[None], grid,
            mode='bilinear', padding_mode='zeros',
            align_corners=False).numpy()[0, :, 0]            # (C, P)
        ours = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts)))
        np.testing.assert_allclose(ours.T, gold, atol=1e-5)


class TestCornerPool:
    def test_directions(self):
        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
        top = np.asarray(corner_pool(x, 'top'))[0, :, :, 0]
        # top pool: each row = max over itself and rows below
        assert (top[0] == np.asarray([8, 9, 10, 11])).all()
        left = np.asarray(corner_pool(x, 'left'))[0, :, :, 0]
        assert (left[:, 0] == np.asarray([3, 7, 11])).all()
        bottom = np.asarray(corner_pool(x, 'bottom'))[0, :, :, 0]
        assert (bottom[2] == np.asarray([8, 9, 10, 11])).all()
        right = np.asarray(corner_pool(x, 'right'))[0, :, :, 0]
        assert (right[:, 3] == np.asarray([3, 7, 11])).all()


class TestMSDeformAttnParity:
    def test_vs_torch_fallback(self):
        # transcription of mmcv multi_scale_deformable_attn_pytorch
        def golden(value, shapes, locs, weights):
            bs, _, M, D = value.shape
            _, Q, _, L, P, _ = locs.shape
            out = torch.zeros(bs, M * D, Q)
            splits = [h * w for h, w in shapes]
            v_list = value.split(splits, dim=1)
            sampling_grids = 2 * locs - 1
            lvl_outs = []
            for lvl, (h, w) in enumerate(shapes):
                v = v_list[lvl].flatten(2).transpose(1, 2).reshape(
                    bs * M, D, h, w)
                grid = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(
                    0, 1)                                     # (B*M, Q, P, 2)
                sampled = torch.nn.functional.grid_sample(
                    v, grid, mode='bilinear', padding_mode='zeros',
                    align_corners=False)                      # (B*M, D, Q, P)
                lvl_outs.append(sampled)
            w_t = weights.transpose(1, 2).reshape(bs * M, 1, Q, L * P)
            out = (torch.stack(lvl_outs, dim=-2).flatten(-2) * w_t).sum(
                -1).view(bs, M * D, Q)
            return out.transpose(1, 2).contiguous()

        rs = np.random.RandomState(2)
        B, M, D, Q, P = 2, 2, 4, 5, 3
        shapes = [(6, 8), (3, 4)]
        n_tot = sum(h * w for h, w in shapes)
        value = rs.rand(B, n_tot, M, D).astype(np.float32)
        locs = rs.rand(B, Q, M, len(shapes), P, 2).astype(np.float32)
        w = rs.rand(B, Q, M, len(shapes), P).astype(np.float32)
        w /= w.sum(axis=(-2, -1), keepdims=True)

        gold = golden(torch.from_numpy(value), shapes,
                      torch.from_numpy(locs), torch.from_numpy(w)).numpy()
        ours = np.asarray(ms_deform_attn_core(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(ours, gold, atol=1e-5)


class TestCarafe:
    def test_vs_naive(self):
        rs = np.random.RandomState(3)
        B, H, W, C, k, s = 1, 4, 5, 3, 3, 2
        x = rs.rand(B, H, W, C).astype(np.float32)
        masks = rs.rand(B, H * s, W * s, k * k).astype(np.float32)
        masks /= masks.sum(-1, keepdims=True)

        gold = np.zeros((B, H * s, W * s, C), np.float32)
        pad = (k - 1) // 2
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        for i in range(H * s):
            for j in range(W * s):
                si, sj = i // s, j // s
                patch = xp[0, si:si + k, sj:sj + k]   # (k, k, C)
                gold[0, i, j] = np.einsum(
                    'abc,ab->c', patch,
                    masks[0, i, j].reshape(k, k))
        ours = np.asarray(carafe(jnp.asarray(x), jnp.asarray(masks), k, s))
        np.testing.assert_allclose(ours, gold, atol=1e-5)


class TestMaskedConvAndCells:
    def test_masked_conv_zeroes_off_mask(self):
        rs = np.random.RandomState(4)
        x = jnp.asarray(rs.rand(1, 6, 6, 3).astype(np.float32))
        w = jnp.asarray(rs.rand(3, 3, 3, 4).astype(np.float32))
        mask = jnp.asarray(rs.rand(1, 6, 6) > 0.5)
        out = masked_conv2d(x, mask, w)
        off = np.asarray(~mask)[..., None] * np.asarray(out)
        assert np.abs(off).max() == 0.0

    def test_cells_shapes(self):
        a = jnp.ones((1, 8, 8, 4))
        b = jnp.ones((1, 4, 4, 4))
        assert sum_cell(a, b, (8, 8)).shape == (1, 8, 8, 4)
        assert sum_cell(a, b, (4, 4)).shape == (1, 4, 4, 4)
        # max-pool downsample keeps max
        big = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(9.0)
        down = resize_to(big, (4, 4))
        assert float(down[0, 1, 1, 0]) == 9.0
        g = global_pooling_cell(a, b, (4, 4))
        assert g.shape == (1, 4, 4, 4)
