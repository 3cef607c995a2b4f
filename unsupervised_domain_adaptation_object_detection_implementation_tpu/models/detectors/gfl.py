"""GFL — Generalized Focal Loss detector (reference
`mmdet/models/detectors/gfl.py` + `mmdet/models/dense_heads/gfl_head.py`).

ATSS-style assignment; classification trained with quality focal loss
(soft IoU targets), regression as a discrete distribution over `reg_max+1`
bins per side (distribution focal loss) + GIoU. Box decode = softmax
expectation of the bins times the stride.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.atss_assigner import atss_assign
from ...core.bbox.coders import bbox2distance, distance2bbox
from ...core.bbox.iou import bbox_overlaps
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import giou_loss
from ..losses.gfocal_loss import distribution_focal_loss, quality_focal_loss
from ..necks.fpn import FPN


@HEADS.register_module()
class GFLHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
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
                          dtype=self.dtype, name='gfl_cls')
        reg_out = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='gfl_reg')
        cls_s, reg_s = [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            scale = self.param(f'scale_{lvl}', nn.initializers.ones, ())
            cls_s.append(cls_out(c))
            reg_s.append(reg_out(r).astype(jnp.float32) *
                         scale.astype(jnp.float32))
        return tuple(cls_s), tuple(reg_s)


def _dist_expectation(reg_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) logits → (..., 4) expected distances (bin units)."""
    shape = reg_logits.shape[:-1]
    p = jax.nn.softmax(reg_logits.reshape(*shape, 4, reg_max + 1), axis=-1)
    bins = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


@DETECTORS.register_module()
class GFL(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # reference anchor_generator octave_base_scale (gfl_r50_fpn_1x_coco.py
    # uses 8 with one scale per octave); tune per-dataset with
    # tools/analysis_tools/optimize_anchors.py
    anchor_scale: float = 8.0
    reg_max: int = 16
    topk: int = 9
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
        self.bbox_head = GFLHead(num_classes=self.num_classes,
                                 reg_max=self.reg_max, dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                              scales=[self.anchor_scale])
        levels = gen.grid_priors(sizes)
        nla = tuple(a.shape[0] for a in levels)
        anchors = jnp.asarray(np.concatenate(levels, axis=0))
        strides_flat = jnp.asarray(np.concatenate([
            np.full(n, s, np.float32) for n, s in zip(nla, self.strides)]))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4 * (self.reg_max + 1))
        return cls, reg, anchors, strides_flat, nla

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors, strides, nla = self._forward_flat(batch['image'])
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            assign = atss_assign(anchors, nla, gt, gtv, gtl, self.topk)
            pos = assign.assigned_gt_inds > 0
            matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                               gt.shape[0] - 1)
            gt_m = gt[matched]
            dist_pred = _dist_expectation(reg_i, self.reg_max)
            boxes_pred = distance2bbox(centers, dist_pred * strides[:, None])
            iou_q = jax.vmap(lambda a, b: bbox_overlaps(
                a[None], b[None])[0, 0])(boxes_pred, gt_m)
            labels = jnp.where(pos, assign.labels, self.num_classes)
            quality = jnp.where(pos, iou_q, 0.0)
            cls_l = quality_focal_loss(cls_i, labels, quality,
                                       reduction='sum')
            # DFL on the 4 per-side distances in bin units
            target_d = bbox2distance(centers, gt_m,
                                     max_dist=float(self.reg_max)) / \
                strides[:, None]
            target_d = jnp.clip(target_d, 0, self.reg_max - 1e-3)
            dfl = distribution_focal_loss(
                reg_i.reshape(-1, self.reg_max + 1),
                target_d.reshape(-1),
                weight=jnp.repeat(pos.astype(jnp.float32), 4),
                reduction='sum')
            pos_f = pos.astype(jnp.float32)
            reg_l = giou_loss(boxes_pred, gt_m, weight=pos_f * quality,
                              reduction='sum')
            return cls_l, reg_l, dfl, jnp.sum(pos_f), jnp.sum(pos_f * quality)

        cls_l, reg_l, dfl_l, npos, qsum = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(
            loss_cls=jnp.sum(cls_l) / denom,
            loss_bbox=2.0 * jnp.sum(reg_l) / jnp.maximum(jnp.sum(qsum), 1e-6),
            loss_dfl=0.25 * jnp.sum(dfl_l) / (4.0 * denom))

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors, strides, _ = self._forward_flat(batch['image'])
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                             (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            a_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            d = _dist_expectation(reg_i[a_idx], self.reg_max)
            boxes = distance2bbox(centers[a_idx],
                                  d * strides[a_idx][:, None])
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
