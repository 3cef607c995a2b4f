"""CenterNet (reference `mmdet/models/detectors/centernet.py` +
`mmdet/models/dense_heads/centernet_head.py`).

Keypoint-style detection: per-class center heatmap + wh + center-offset
heads on a single stride-4 map. Gaussian heatmap targets render densely
(one (G, H, W) exp evaluation — no splatting loops), decoding is
3×3-max-pool peak picking + top-k, NMS-free.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..losses import gaussian_focal_loss, l1_loss
from ..necks.fpn import FPN


def gaussian_radius(h, w, min_overlap: float = 0.3):
    """CornerNet radius heuristic (reference `models/utils/gaussian_target.py`)."""
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0))
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0))
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterNetTestConfig(NamedTuple):
    topk: int = 100
    score_thr: float = 0.05


@HEADS.register_module()
class CenterNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def branch(out_ch, name, bias=0.0):
            h = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'{name}_conv')(x)
            h = nn.relu(h)
            return nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(bias),
                           name=f'{name}_out')(h)

        heat = branch(self.num_classes, 'heatmap', bias=-4.595)
        wh = branch(2, 'wh')
        offset = branch(2, 'offset')
        return heat, wh, offset


@DETECTORS.register_module()
class CenterNet(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 18
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = -1
    stride: int = 4
    test_cfg: CenterNetTestConfig = CenterNetTestConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        # FPN down to one stride-4 map stands in for the reference's
        # CTResNetNeck (deconv upsampling)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=64, num_outs=4, dtype=self.dtype)
        self.bbox_head = CenterNetHead(num_classes=self.num_classes,
                                       feat_channels=64, dtype=self.dtype)

    def _forward(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        return self.bbox_head(feats[0])          # stride-4 level

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        heat, wh, offset = self._forward(batch['image'])
        b, h, w, c = heat.shape
        s = float(self.stride)

        def per_image(gt, gtv):
            cx = (gt[:, 0] + gt[:, 2]) * 0.5 / s
            cy = (gt[:, 1] + gt[:, 3]) * 0.5 / s
            gw = (gt[:, 2] - gt[:, 0]) / s
            gh = (gt[:, 3] - gt[:, 1]) / s
            r = jnp.maximum(gaussian_radius(gh, gw), 1e-3)
            sigma = (2 * r + 1) / 6.0
            ys = jnp.arange(h, dtype=jnp.float32)
            xs = jnp.arange(w, dtype=jnp.float32)
            cix = jnp.floor(cx)
            ciy = jnp.floor(cy)
            g2 = jnp.exp(-(((xs[None, None, :] - cix[:, None, None])**2 +
                            (ys[None, :, None] - ciy[:, None, None])**2) /
                           (2 * sigma[:, None, None]**2)))       # (G, H, W)
            g2 = g2 * gtv[:, None, None]
            return g2, cix.astype(jnp.int32), ciy.astype(jnp.int32), \
                jnp.stack([gw, gh], -1), \
                jnp.stack([cx - cix, cy - ciy], -1)

        g2, cix, ciy, wh_t, off_t = jax.vmap(per_image)(
            batch['gt_bboxes'], batch['gt_valid'])

        gmax = batch['gt_bboxes'].shape[1]
        labels = jnp.clip(batch['gt_labels'], 0, c - 1)
        # per-class max over gts of that class
        onehot = jax.nn.one_hot(labels, c) * \
            batch['gt_valid'][..., None]                       # (B, G, C)
        heat_t = jnp.max(g2[:, :, None, :, :] *
                         onehot[:, :, :, None, None], axis=1)  # (B, C, H, W)
        heat_t = heat_t.transpose(0, 2, 3, 1)

        heat_p = jnp.clip(jax.nn.sigmoid(heat.astype(jnp.float32)),
                          1e-4, 1 - 1e-4)
        loss_heat = gaussian_focal_loss(heat_p, heat_t, reduction='sum')
        n_pos = jnp.maximum(jnp.sum(batch['gt_valid']), 1.0)

        # gather wh/offset preds at center cells
        def gather(pred_map, xi, yi):
            flat = pred_map.reshape(-1, 2)
            idx = yi * w + xi
            return flat[jnp.clip(idx, 0, h * w - 1)]

        def per_image_reg(whm, offm, xi, yi, wt, ot, gtv):
            pw = gather(whm, xi, yi)
            po = gather(offm, xi, yi)
            m = gtv[:, None].astype(jnp.float32)
            return (jnp.sum(jnp.abs(pw - wt) * m),
                    jnp.sum(jnp.abs(po - ot) * m))

        wh_l, off_l = jax.vmap(per_image_reg)(
            wh.astype(jnp.float32), offset.astype(jnp.float32), cix, ciy,
            wh_t, off_t, batch['gt_valid'])
        return dict(loss_center_heatmap=loss_heat / n_pos,
                    loss_wh=0.1 * jnp.sum(wh_l) / n_pos,
                    loss_offset=jnp.sum(off_l) / n_pos)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        heat, wh, offset = self._forward(batch['image'])
        b, h, w, c = heat.shape
        s = float(self.stride)
        prob = jax.nn.sigmoid(heat.astype(jnp.float32))
        # peak picking: keep only local maxima (3x3)
        pooled = nn.max_pool(prob, (3, 3), strides=(1, 1),
                             padding=[(1, 1)] * 2)
        prob = jnp.where(jnp.abs(pooled - prob) < 1e-6, prob, 0.0)
        k = self.test_cfg.topk

        def per_image(p, whm, offm, shape_i):
            flat = p.reshape(-1)
            top, idx = jax.lax.top_k(flat, k)
            cell = idx // c
            label = (idx % c).astype(jnp.int32)
            yi = cell // w
            xi = cell % w
            po = offm.reshape(-1, 2)[cell]
            pw = whm.reshape(-1, 2)[cell]
            cxs = (xi.astype(jnp.float32) + po[:, 0]) * s
            cys = (yi.astype(jnp.float32) + po[:, 1]) * s
            bw = pw[:, 0] * s
            bh = pw[:, 1] * s
            boxes = jnp.stack([cxs - bw / 2, cys - bh / 2,
                               cxs + bw / 2, cys + bh / 2], -1)
            hh = shape_i[0].astype(jnp.float32)
            ww = shape_i[1].astype(jnp.float32)
            boxes = jnp.clip(boxes, 0.0,
                             jnp.stack([ww, hh, ww, hh]))
            valid = top > self.test_cfg.score_thr
            dets = jnp.concatenate(
                [boxes * valid[:, None], jnp.where(valid, top, 0.0)[:, None]],
                -1)
            return dets, jnp.where(valid, label, 0), valid

        dets, labels, valid = jax.vmap(per_image)(
            prob, wh.astype(jnp.float32), offset.astype(jnp.float32),
            batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
