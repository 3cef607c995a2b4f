"""ATSS detector (reference `mmdet/models/detectors/atss.py` +
`mmdet/models/dense_heads/atss_head.py`): RetinaNet-shaped head with one
anchor per location, adaptive training sample selection, GIoU box loss and
centerness branch."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.atss_assigner import atss_assign
from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import giou_loss, sigmoid_focal_loss
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..necks.fpn import FPN


@HEADS.register_module()
class ATSSHead(nn.Module):
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
                          dtype=self.dtype, name='atss_cls')
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='atss_reg')
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='atss_centerness')
        cls_s, reg_s, ctr_s = [], [], []
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
            ctr_s.append(ctr_out(r))
        return tuple(cls_s), tuple(reg_s), tuple(ctr_s)


@DETECTORS.register_module()
class ATSS(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
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
        self.bbox_head = ATSSHead(num_classes=self.num_classes,
                                  dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv, ctr_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides),
                              ratios=[1.0], scales=[8])
        levels = gen.grid_priors(sizes)
        nla = tuple(a.shape[0] for a in levels)
        anchors = jnp.asarray(np.concatenate(levels, axis=0))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        ctr = flatten_level_preds(ctr_lv, 1)
        return cls, reg, ctr, anchors, nla

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, ctr, anchors, nla = self._forward_flat(batch['image'])

        def per_image(cls_i, reg_i, ctr_i, gt, gtl, gtv):
            assign = atss_assign(anchors, nla, gt, gtv, gtl, self.topk)
            pos = assign.assigned_gt_inds > 0
            labels = jnp.where(pos, assign.labels, self.num_classes)
            cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
            matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                               gt.shape[0] - 1)
            gt_m = gt[matched]
            boxes_pred = delta2bbox(anchors, reg_i)
            # centerness target from anchor center vs gt box
            ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
            ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
            l_ = ax - gt_m[:, 0]
            r_ = gt_m[:, 2] - ax
            t_ = ay - gt_m[:, 1]
            b_ = gt_m[:, 3] - ay
            ratio = (jnp.minimum(l_, r_) / jnp.maximum(
                jnp.maximum(l_, r_), 1e-6)) * \
                (jnp.minimum(t_, b_) / jnp.maximum(jnp.maximum(t_, b_), 1e-6))
            ctr_t = jnp.sqrt(jnp.clip(ratio, 0.0, 1.0))
            pos_f = pos.astype(jnp.float32)
            reg_l = giou_loss(boxes_pred, gt_m, weight=pos_f * ctr_t,
                              reduction='sum')
            ctr_l = binary_cross_entropy(ctr_i[:, 0], ctr_t, weight=pos_f,
                                         reduction='sum')
            return cls_l, reg_l, ctr_l, jnp.sum(pos_f), jnp.sum(pos_f * ctr_t)

        cls_l, reg_l, ctr_l, npos, ctr_sum = jax.vmap(per_image)(
            cls, reg, ctr, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(
            loss_cls=jnp.sum(cls_l) / denom,
            loss_bbox=2.0 * jnp.sum(reg_l) / jnp.maximum(jnp.sum(ctr_sum),
                                                         1e-6),
            loss_centerness=jnp.sum(ctr_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, ctr, anchors, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, ctr_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
                jax.nn.sigmoid(ctr_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            a_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = delta2bbox(anchors[a_idx], reg_i[a_idx])
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

        dets, labels, valid = jax.vmap(per_image)(cls, reg, ctr,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
