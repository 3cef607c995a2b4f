"""PAA (reference `mmdet/models/detectors/paa.py` +
`mmdet/models/dense_heads/paa_head.py`).

Probabilistic Anchor Assignment on the ATSS tower: candidate anchors per
gt (top-k by joint cls+loc loss per level) get a 2-component 1-D Gaussian
mixture fitted over their losses; anchors under the low-loss component
(score ≥ 0.5 responsibility, below the components' crossover) are
positives.

The reference fits sklearn GMMs per gt on CPU inside the train step; here
the EM is a fixed-iteration `lax`-friendly loop over the padded (G, K)
candidate-loss matrix — fully on-device and batched over gts.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.iou import bbox_overlaps
from ...core.bbox.transforms import clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import giou_loss, sigmoid_focal_loss
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..necks.fpn import FPN
from .atss import ATSSHead


def gmm_split(losses: jnp.ndarray, valid: jnp.ndarray, iters: int = 10
              ) -> jnp.ndarray:
    """Fit a 2-component 1-D GMM per row of `losses` (G, K) with fixed-iter
    EM; return bool (G, K) positive mask = responsibility of the low-loss
    component > 0.5 (mirrors `paa_head.py:gmm_separation_scheme`)."""
    big = 1e8
    x = jnp.where(valid, losses, big)
    lo = jnp.min(x, axis=1, keepdims=True)
    hi = jnp.max(jnp.where(valid, losses, -big), axis=1, keepdims=True)
    mu = jnp.concatenate([lo, hi], axis=1)                   # (G, 2)
    var = jnp.ones_like(mu)
    pi = jnp.full_like(mu, 0.5)

    def em(_, state):
        mu, var, pi = state
        # E step
        logp = -0.5 * ((x[:, :, None] - mu[:, None, :]) ** 2
                       / jnp.maximum(var[:, None, :], 1e-6)) \
            - 0.5 * jnp.log(jnp.maximum(var[:, None, :], 1e-6)) \
            + jnp.log(jnp.maximum(pi[:, None, :], 1e-12))
        r = jax.nn.softmax(logp, axis=2)                     # (G, K, 2)
        r = r * valid[:, :, None]
        # M step
        nk = jnp.maximum(jnp.sum(r, axis=1), 1e-6)           # (G, 2)
        mu_n = jnp.sum(r * x[:, :, None], axis=1) / nk
        var_n = jnp.sum(r * (x[:, :, None] - mu_n[:, None, :]) ** 2,
                        axis=1) / nk
        pi_n = nk / jnp.maximum(jnp.sum(nk, axis=1, keepdims=True), 1e-6)
        return mu_n, jnp.maximum(var_n, 1e-6), pi_n

    mu, var, pi = jax.lax.fori_loop(0, iters, em, (mu, var, pi))
    logp = -0.5 * ((x[:, :, None] - mu[:, None, :]) ** 2
                   / var[:, None, :]) \
        - 0.5 * jnp.log(var[:, None, :]) + jnp.log(jnp.maximum(
            pi[:, None, :], 1e-12))
    r = jax.nn.softmax(logp, axis=2)
    low_is_0 = (mu[:, 0] <= mu[:, 1])[:, None]
    resp_low = jnp.where(low_is_0, r[..., 0], r[..., 1])
    return (resp_low > 0.5) & valid


@DETECTORS.register_module()
class PAA(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    topk_per_level: int = 9
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
        cls_lv, reg_lv, iou_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                              scales=[8])
        levels = gen.grid_priors(sizes)
        nla = tuple(a.shape[0] for a in levels)
        anchors = jnp.asarray(np.concatenate(levels, axis=0))
        lvl_ids = jnp.asarray(np.concatenate(
            [np.full((n,), i, np.int32) for i, n in enumerate(nla)]))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        iou_p = flatten_level_preds(iou_lv, 1)
        return cls, reg, iou_p, anchors, lvl_ids

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, iou_p, anchors, lvl_ids = self._forward_flat(
            batch['image'])
        return paa_loss(cls, reg, iou_p, anchors, lvl_ids, batch,
                        self.num_classes, len(self.strides),
                        self.topk_per_level)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, iou_p, anchors, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, reg_i, iou_i, shape_i):
            # score voting uses cls·sqrt(iou) (paa_head.py get_bboxes)
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32)) * \
                jnp.sqrt(jax.nn.sigmoid(iou_i.astype(jnp.float32)))
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

        dets, labels, valid = jax.vmap(per_image)(cls, reg, iou_p,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


def paa_loss(cls, reg, iou_p, anchors, lvl_ids, batch, C, L, K,
             assign_cls=None, assign_reg=None):
    """PAA losses over flattened level preds.

    `assign_cls`/`assign_reg` optionally supply the predictions that DRIVE
    the probabilistic assignment (GMM over candidate losses) while
    `cls`/`reg`/`iou_p` are the predictions being SUPERVISED. With the
    defaults they are the same tensors — vanilla PAA. LAD (reference
    `mmdet/models/detectors/lad.py` + `lad_head.py`) passes a frozen
    teacher's preds as the assignment source.
    """
    if assign_cls is None:
        assign_cls = cls
    if assign_reg is None:
        assign_reg = reg

    def per_image(cls_i, reg_i, iou_i, acls_i, areg_i, gt, gtl, gtv):
        gl = jnp.clip(gtl, 0, C - 1)
        p = jax.nn.sigmoid(jax.lax.stop_gradient(
            acls_i.astype(jnp.float32)))
        aboxes = delta2bbox(anchors, jax.lax.stop_gradient(
            areg_i.astype(jnp.float32)))
        boxes = delta2bbox(anchors, reg_i.astype(jnp.float32))
        ious_all = bbox_overlaps(gt, aboxes)
        # joint candidate loss: -log p_cls[gt class] - log IoU
        cand_loss = -jnp.log(jnp.maximum(p[:, gl].T, 1e-8)) \
            - jnp.log(jnp.maximum(ious_all, 1e-8))       # (G, N)
        # candidates must have center inside gt (ATSS spirit)
        ax = (anchors[:, 0] + anchors[:, 2]) * 0.5
        ay = (anchors[:, 1] + anchors[:, 3]) * 0.5
        inside = ((ax[None] >= gt[:, 0:1]) & (ax[None] <= gt[:, 2:3])
                  & (ay[None] >= gt[:, 1:2]) & (ay[None] <= gt[:, 3:4]))
        cand_loss = jnp.where(inside & gtv[:, None], cand_loss, 1e8)

        # top-K per level per gt
        idxs, vals, valids = [], [], []
        for li in range(L):
            masked = jnp.where(lvl_ids[None, :] == li, -cand_loss, -1e9)
            v, ix = jax.lax.top_k(masked, K)             # (G, K)
            idxs.append(ix)
            vals.append(-v)
            valids.append(v > -1e8)
        cand_idx = jnp.concatenate(idxs, axis=1)          # (G, L*K)
        cand_val = jnp.concatenate(vals, axis=1)
        cand_ok = jnp.concatenate(valids, axis=1) & gtv[:, None]

        pos_mask_cand = gmm_split(cand_val, cand_ok)      # (G, L*K)

        # scatter to anchor space; contested anchors -> lowest loss gt
        n = anchors.shape[0]
        big = 1e8
        loss_at = jnp.full((n,), big)
        flat_idx = cand_idx.reshape(-1)
        flat_loss = jnp.where(pos_mask_cand, cand_val, big).reshape(-1)
        loss_at = loss_at.at[flat_idx].min(flat_loss)
        # winner gt = argmin over gts of (loss if assigned else big)
        per_gt_loss = jnp.full((gt.shape[0], n), big)
        per_gt_loss = jax.vmap(
            lambda row, ix, ls: row.at[ix].min(ls))(
            per_gt_loss, cand_idx,
            jnp.where(pos_mask_cand, cand_val, big))
        gt_at = jnp.argmin(per_gt_loss, axis=0).astype(jnp.int32)
        pos = loss_at < big / 2

        labels = jnp.where(pos, gl[gt_at], C)
        cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
        gt_m = gt[gt_at]
        pos_f = pos.astype(jnp.float32)
        reg_l = giou_loss(boxes, gt_m, weight=pos_f, reduction='sum')
        iou_t = jax.vmap(lambda b, g: bbox_overlaps(
            b[None], g[None])[0, 0])(jax.lax.stop_gradient(boxes), gt_m)
        iou_l = binary_cross_entropy(iou_i[:, 0], iou_t, weight=pos_f,
                                     reduction='sum')
        return cls_l, reg_l, iou_l, jnp.sum(pos_f)

    cls_l, reg_l, iou_l, npos = jax.vmap(per_image)(
        cls, reg, iou_p, assign_cls, assign_reg, batch['gt_bboxes'],
        batch['gt_labels'], batch['gt_valid'])
    denom = jnp.maximum(jnp.sum(npos), 1.0)
    return dict(loss_cls=jnp.sum(cls_l) / denom,
                loss_bbox=1.3 * jnp.sum(reg_l) / denom,
                loss_iou=0.5 * jnp.sum(iou_l) / denom)
