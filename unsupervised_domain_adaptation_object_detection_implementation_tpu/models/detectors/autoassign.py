"""AutoAssign (reference `mmdet/models/detectors/autoassign.py` +
`mmdet/models/dense_heads/autoassign_head.py`).

Fully differentiable assignment on the FCOS tower: a learned per-class
Gaussian center prior weights in-box points; positive confidences
P⁺ = P(cls)·P(loc) are re-weighted by exp(P⁺/τ)·prior and normalized per
gt; every in-box point also contributes a negative loss weighted by
(1 − f(iou)) where f is the reference's saturation. No hard assignment at
all — both weightings are closed-form tensor ops, ideal for one fused XLA
kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox.coders import distance2bbox
from ...core.bbox.iou import bbox_overlaps
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..necks.fpn import FPN
from .fcos import FCOSHead, fcos_points
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms


@DETECTORS.register_module()
class AutoAssign(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pos_temperature: float = 3.0
    neg_temperature: float = 2.0   # iou saturation power (paper τ₂)
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs='on_output',
                        relu_before_extra_convs=True, dtype=self.dtype)
        self.bbox_head = FCOSHead(num_classes=self.num_classes,
                                  dtype=self.dtype)
        # learned center prior: per-class mean/sigma offsets
        self.prior_mu = self.param('center_prior_mu',
                                   nn.initializers.zeros,
                                   (self.num_classes, 2))
        self.prior_sigma = self.param('center_prior_sigma',
                                      nn.initializers.ones,
                                      (self.num_classes, 2))

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv, obj_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        pts, strs, _ = fcos_points(sizes, self.strides)
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        obj = flatten_level_preds(obj_lv, 1)
        return cls, reg, obj, jnp.asarray(pts), jnp.asarray(strs)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, obj, pts, strs = self._forward_flat(batch['image'])
        C = self.num_classes

        def per_image(cls_i, reg_i, obj_i, gt, gtl, gtv):
            p_cls = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            p_obj = jax.nn.sigmoid(obj_i.astype(jnp.float32))[:, 0]
            p_joint = p_cls * p_obj[:, None]                    # (N, C)
            boxes = distance2bbox(pts, reg_i * strs[:, None])

            gl = jnp.clip(gtl, 0, C - 1)
            # in-box mask (G, N)
            inside = ((pts[None, :, 0] >= gt[:, 0:1])
                      & (pts[None, :, 0] <= gt[:, 2:3])
                      & (pts[None, :, 1] >= gt[:, 1:2])
                      & (pts[None, :, 1] <= gt[:, 3:4])) & gtv[:, None]

            # center prior (G, N): Gaussian of normalized offset
            ctr = (gt[:, :2] + gt[:, 2:]) / 2
            wh = jnp.maximum(gt[:, 2:] - gt[:, :2], 1e-6)
            off = (pts[None, :, :] - ctr[:, None, :]) / wh[:, None, :]
            mu = self.prior_mu[gl]                               # (G, 2)
            sig = jnp.maximum(jnp.abs(self.prior_sigma[gl]), 0.1)
            prior = jnp.exp(-jnp.sum(
                ((off - mu[:, None, :]) / sig[:, None, :]) ** 2, -1) / 2)
            prior = jnp.where(inside, prior, 0.0)

            # loc prob: exp(-5·GIoU_loss) like the reference λ=5
            ious = bbox_overlaps(gt, boxes)                      # (G, N)
            p_loc = jnp.exp(self.pos_temperature *
                            (ious - 1.0))
            p_pos = p_cls[:, gl].T * p_obj[None, :] * p_loc      # (G, N)

            # positive weighting: softmax-ish over in-box points
            w_un = jnp.exp(p_pos / 0.125) * prior
            w = jnp.where(inside, w_un, 0.0)
            w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
            bag = jnp.sum(p_pos * w, axis=1)                     # (G,)
            pos_loss = -jnp.log(jnp.clip(bag, 1e-12, None))
            pos_loss = jnp.sum(jnp.where(gtv, pos_loss, 0.0))

            # negative: every location, focal on p_joint, down-weighted by
            # the max iou-saturation over gts covering it
            f_iou = jnp.clip(ious / 0.7, None, 1.0) ** self.neg_temperature
            cls_onehot = jax.nn.one_hot(gl, C) * gtv[:, None]
            covered = jnp.einsum('gn,gc->nc',
                                 jnp.where(inside, f_iou, 0.0), cls_onehot)
            covered = jnp.clip(covered, 0, 1)
            neg_p = p_joint * (1 - covered)
            neg_loss = jnp.sum(neg_p ** 2 *
                               -jnp.log(jnp.clip(1 - neg_p, 1e-12, None)))
            return pos_loss, neg_loss, jnp.sum(gtv)

        pos_l, neg_l, ngt = jax.vmap(per_image)(
            cls, reg, obj, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        n = jnp.maximum(jnp.sum(ngt), 1.0)
        return dict(loss_pos=jnp.sum(pos_l) / n,
                    loss_neg=jnp.sum(neg_l) / n)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, obj, pts, strs = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, obj_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
                jax.nn.sigmoid(obj_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = distance2bbox(pts[p_idx],
                                  reg_i[p_idx] * strs[p_idx, None])
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

        dets, labels, valid = jax.vmap(per_image)(cls, reg, obj,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
