"""FSAF (reference `mmdet/models/detectors/fsaf.py` +
`mmdet/models/dense_heads/fsaf_head.py`).

Feature-Selective Anchor-Free: RetinaNet tower with an anchor-free branch;
each gt's *effective* (center) region supervises exactly one pyramid level,
chosen online as the level with the lowest current loss
(`fsaf_head.py:get_targets` + `losses/utils` select logic). Regression is
TBLR distances normalized by stride·normalize_factor.

TPU shape: the online feature selection becomes a dense (G, L) matrix of
masked mean losses over each gt's effective region per level, argmin over
L — no per-gt loops; ignore (shadow) regions get zero cls weight.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.coders import bbox2tblr, tblr2bbox
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import sigmoid_focal_loss
from ..losses.iou_loss import iou_loss
from ..necks.fpn import FPN


@HEADS.register_module()
class FSAFHead(nn.Module):
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
                          dtype=self.dtype, name='retina_cls')
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='retina_reg')
        cls_s, reg_s = [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_s.append(cls_out(c))
            # relu keeps TBLR distances positive (`fsaf_head.py` uses
            # relu(x)+eps via the coder's normalizer)
            reg_s.append(nn.relu(reg_out(r).astype(jnp.float32)) + 1e-4)
        return tuple(cls_s), tuple(reg_s)


@DETECTORS.register_module()
class FSAF(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_scale: float = 0.2       # effective region
    ignore_scale: float = 0.5    # shadow region
    normalize_factor: float = 4.0
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
        self.bbox_head = FSAFHead(num_classes=self.num_classes,
                                  dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        pts, strs, lvl = [], [], []
        for li, ((h, w), s) in enumerate(zip(sizes, self.strides)):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
            pts.append(np.stack([xs.ravel() * s + s / 2,
                                 ys.ravel() * s + s / 2],
                                -1).astype(np.float32))
            strs.append(np.full((h * w,), s, np.float32))
            lvl.append(np.full((h * w,), li, np.int32))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        return (cls, reg, jnp.asarray(np.concatenate(pts)),
                jnp.asarray(np.concatenate(strs)),
                jnp.asarray(np.concatenate(lvl)))

    def _regions(self, gt, pts):
        """(G, N) membership masks for effective and ignore regions."""
        ctr = (gt[:, :2] + gt[:, 2:]) / 2
        half = (gt[:, 2:] - gt[:, :2]) / 2

        def inside(scale):
            lo = ctr - half * scale
            hi = ctr + half * scale
            return ((pts[None, :, 0] >= lo[:, 0:1])
                    & (pts[None, :, 0] <= hi[:, 0:1])
                    & (pts[None, :, 1] >= lo[:, 1:2])
                    & (pts[None, :, 1] <= hi[:, 1:2]))
        return inside(self.pos_scale), inside(self.ignore_scale)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, pts, strs, lvl = self._forward_flat(batch['image'])
        n_lvl = len(self.strides)

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            in_core, in_shadow = self._regions(gt, pts)        # (G, N)
            in_core = in_core & gtv[:, None]
            in_shadow = in_shadow & gtv[:, None]

            # candidate losses per (g, n): focal on the gt class + IoU loss
            # of the TBLR decode, both detached (selection only)
            p_cls = jax.nn.sigmoid(jax.lax.stop_gradient(
                cls_i.astype(jnp.float32)))
            gl = jnp.clip(gtl, 0, self.num_classes - 1)
            p_at = p_cls[:, gl].T                               # (G, N)
            cand_cls = -jnp.log(jnp.maximum(p_at, 1e-8))
            norm = strs * self.normalize_factor
            dec = tblr2bbox(
                jnp.concatenate([pts, pts], -1),
                jax.lax.stop_gradient(reg_i) * norm[:, None],
                normalizer=1.0, normalize_by_wh=False)
            inter_x1 = jnp.maximum(dec[None, :, 0], gt[:, None, 0])
            inter_y1 = jnp.maximum(dec[None, :, 1], gt[:, None, 1])
            inter_x2 = jnp.minimum(dec[None, :, 2], gt[:, None, 2])
            inter_y2 = jnp.minimum(dec[None, :, 3], gt[:, None, 3])
            iw = jnp.maximum(inter_x2 - inter_x1, 0)
            ih = jnp.maximum(inter_y2 - inter_y1, 0)
            inter = iw * ih
            area_d = jnp.maximum((dec[:, 2] - dec[:, 0])
                                 * (dec[:, 3] - dec[:, 1]), 1e-6)
            area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
            iou = inter / jnp.maximum(area_d[None] + area_g[:, None]
                                      - inter, 1e-6)
            cand = cand_cls - jnp.log(jnp.maximum(iou, 1e-8))

            # online level selection: mean candidate loss per (g, level)
            lvl_onehot = jax.nn.one_hot(lvl, n_lvl)             # (N, L)
            w = in_core.astype(jnp.float32)                     # (G, N)
            sums = jnp.einsum('gn,nl->gl', w * cand, lvl_onehot)
            cnts = jnp.einsum('gn,nl->gl', w, lvl_onehot)
            mean_l = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), jnp.inf)
            best_lvl = jnp.argmin(mean_l, axis=1)               # (G,)

            sel = in_core & (lvl[None, :] == best_lvl[:, None])
            # smallest gt wins contested points
            area = jnp.where(gtv, area_g, jnp.inf)
            key = jnp.where(sel, area[:, None], jnp.inf)
            best_gt = jnp.argmin(key, axis=0)
            pos = jnp.any(sel, axis=0)
            ignore = jnp.any(in_shadow, axis=0) & ~pos

            labels = jnp.where(pos, gtl[best_gt], self.num_classes)
            w_cls = jnp.where(ignore, 0.0, 1.0)
            cls_l = sigmoid_focal_loss(cls_i, labels,
                                       weight=w_cls[:, None],
                                       reduction='sum')
            gt_m = gt[best_gt]
            tblr_t = bbox2tblr(jnp.concatenate([pts, pts], -1), gt_m,
                               normalizer=1.0, normalize_by_wh=False) / norm[:, None]
            pos_f = pos.astype(jnp.float32)
            dec_live = tblr2bbox(jnp.concatenate([pts, pts], -1),
                                 reg_i * norm[:, None], normalizer=1.0, normalize_by_wh=False)
            reg_l = iou_loss(dec_live, gt_m, weight=pos_f, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos_f)

        cls_l, reg_l, npos = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox=jnp.sum(reg_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, pts, strs, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes
        norm = strs * self.normalize_factor

        def per_image(cls_i, reg_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = tblr2bbox(
                jnp.concatenate([pts[p_idx], pts[p_idx]], -1),
                reg_i[p_idx] * norm[p_idx, None], normalizer=1.0, normalize_by_wh=False)
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
