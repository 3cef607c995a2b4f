"""FoveaBox (reference `mmdet/models/detectors/fovea.py` +
`mmdet/models/dense_heads/fovea_head.py`).

Per-level fovea (shrunk center) regions select positives; regression is
log-space normalized corner offsets against the level's base edge. Scale
ranges overlap so a gt can train on two adjacent levels
(`fovea_head.py:get_targets`).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..necks.fpn import FPN

SCALE_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
BASE_EDGES = (16, 32, 64, 128, 256)


@HEADS.register_module()
class FoveaHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='fovea_cls')
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='fovea_reg')
        cls_s, reg_s = [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_s.append(cls_out(c))
            reg_s.append(reg_out(r).astype(jnp.float32))
        return tuple(cls_s), tuple(reg_s)


@DETECTORS.register_module()
class FoveaBox(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    sigma: float = 0.4
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs='on_input', dtype=self.dtype)
        self.bbox_head = FoveaHead(num_classes=self.num_classes,
                                   dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        pts, strs, base, rlo, rhi = [], [], [], [], []
        for li, ((h, w), s) in enumerate(zip(sizes, self.strides)):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
            pts.append(np.stack([(xs.ravel() + 0.5) * s,
                                 (ys.ravel() + 0.5) * s],
                                -1).astype(np.float32))
            strs.append(np.full((h * w,), s, np.float32))
            base.append(np.full((h * w,), BASE_EDGES[li], np.float32))
            rlo.append(np.full((h * w,), SCALE_RANGES[li][0], np.float32))
            rhi.append(np.full((h * w,), SCALE_RANGES[li][1], np.float32))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        cat = lambda a: jnp.asarray(np.concatenate(a))
        return (cls, reg, cat(pts), cat(strs), cat(base), cat(rlo),
                cat(rhi))

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        (cls, reg, pts, strs, base, rlo, rhi) = self._forward_flat(
            batch['image'])

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            area_sqrt = jnp.sqrt(jnp.maximum(
                (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]), 0.0))
            in_scale = (area_sqrt[:, None] >= rlo[None, :]) & \
                (area_sqrt[:, None] <= rhi[None, :])           # (G, N)
            ctr = (gt[:, :2] + gt[:, 2:]) / 2
            half = (gt[:, 2:] - gt[:, :2]) / 2 * self.sigma
            in_fovea = ((pts[None, :, 0] >= (ctr[:, 0] - half[:, 0])[:, None])
                        & (pts[None, :, 0] <= (ctr[:, 0]
                                               + half[:, 0])[:, None])
                        & (pts[None, :, 1] >= (ctr[:, 1]
                                               - half[:, 1])[:, None])
                        & (pts[None, :, 1] <= (ctr[:, 1]
                                               + half[:, 1])[:, None]))
            cand = in_scale & in_fovea & gtv[:, None]
            area = jnp.where(gtv, area_sqrt, jnp.inf)
            key = jnp.where(cand, area[:, None], jnp.inf)
            best = jnp.argmin(key, axis=0)
            pos = jnp.any(cand, axis=0)
            labels = jnp.where(pos, gtl[best], self.num_classes)
            cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')

            gt_m = gt[best]
            # log-space corner targets (`fovea_head.py:104-116`)
            t = jnp.stack([
                (pts[:, 0] - gt_m[:, 0]) / base,
                (pts[:, 1] - gt_m[:, 1]) / base,
                (gt_m[:, 2] - pts[:, 0]) / base,
                (gt_m[:, 3] - pts[:, 1]) / base], axis=-1)
            t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
            pos_f = pos.astype(jnp.float32)[:, None]
            reg_l = smooth_l1_loss(reg_i, t,
                                   weight=jnp.broadcast_to(pos_f,
                                                           reg_i.shape),
                                   beta=0.11, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos_f)

        cls_l, reg_l, npos = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox=jnp.sum(reg_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, pts, strs, base, _, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            d = jnp.exp(reg_i[p_idx]) * base[p_idx, None]
            boxes = jnp.stack([
                pts[p_idx, 0] - d[:, 0], pts[p_idx, 1] - d[:, 1],
                pts[p_idx, 0] + d[:, 2], pts[p_idx, 1] + d[:, 3]], axis=-1)
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            keep, _ = batched_nms(boxes, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            m = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, m)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(cls, reg,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
