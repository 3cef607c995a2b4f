"""YOLACT (reference `mmdet/models/detectors/yolact.py` +
`mmdet/models/dense_heads/yolact_head.py` — YOLACTHead/YOLACTProtonet/
YOLACTSegmHead).

Real-time instance segmentation: a RetinaNet-style box head additionally
predicts k prototype coefficients per anchor; a protonet produces k
full-resolution prototype masks; instance mask = σ(coeffs · protos),
cropped to the predicted box. Auxiliary semantic segmentation head as in
the reference.

TPU shape: mask assembly is one einsum (B, A, k)×(B, H, W, k); the crop is
a coordinate mask (no gather); coefficient targets follow the positive
anchors of the shared MaxIoU assignment.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.transforms import clip_boxes, delta2bbox, bbox2delta
from ...core.post.nms import NEG_INF, batched_nms, fast_nms_keep
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import smooth_l1_loss
from ..losses.cross_entropy_loss import (binary_cross_entropy,
                                         softmax_cross_entropy)
from ..necks.fpn import FPN


@HEADS.register_module()
class YOLACTProtonet(nn.Module):
    """3 convs → upsample ×2 → conv → 1x1 to k prototypes
    (`yolact_head.py:YOLACTProtonet`)."""

    num_protos: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f'conv{i}')(x))
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method='bilinear')
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name='conv_up')(x))
        return nn.Conv(self.num_protos, (1, 1), dtype=self.dtype,
                       name='protos')(x)


@DETECTORS.register_module()
class YOLACT(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    num_protos: int = 32
    num_anchors: int = 3
    test_cfg: DensePredictConfig = DensePredictConfig()
    # reference YOLACT defaults to fast NMS (`yolact.py` test_cfg
    # fast_nms); exact greedy batched NMS selectable for ablation
    use_fast_nms: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs='on_input', dtype=self.dtype)
        self.protonet = YOLACTProtonet(num_protos=self.num_protos,
                                       dtype=self.dtype)
        # head convs declared here; applied per level in _forward
        self.head_conv = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                                 dtype=self.dtype, name='head_conv')
        self.cls_out = nn.Conv(self.num_anchors * (self.num_classes + 1),
                               (3, 3), padding=[(1, 1)] * 2,
                               dtype=self.dtype, name='cls_out')
        self.reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                               padding=[(1, 1)] * 2, dtype=self.dtype,
                               name='reg_out')
        self.coef_out = nn.Conv(self.num_anchors * self.num_protos, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name='coef_out')
        self.segm_out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                name='segm_out')

    def _forward(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        protos = self.protonet(feats[0])                    # (B, Hp, Wp, k)
        segm = self.segm_out(feats[0]).astype(jnp.float32)
        cls_lv, reg_lv, coef_lv = [], [], []
        for f in feats:
            h = nn.relu(self.head_conv(f))
            cls_lv.append(self.cls_out(h))
            reg_lv.append(self.reg_out(h))
            coef_lv.append(jnp.tanh(
                self.coef_out(h).astype(jnp.float32)))
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides),
                              ratios=[0.5, 1.0, 2.0], scales=[4])
        anchors = jnp.asarray(
            np.concatenate(gen.grid_priors(sizes), axis=0))
        cls = flatten_level_preds(cls_lv, self.num_classes + 1)
        reg = flatten_level_preds(reg_lv, 4)
        coef = flatten_level_preds(coef_lv, self.num_protos)
        return cls, reg, coef, protos, segm, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, coef, protos, segm, anchors = self._forward(
            batch['image'])
        gm = batch.get('gt_masks_full')      # (B, G, Hp, Wp) at proto res

        def per_image(cls_i, reg_i, coef_i, protos_i, gt, gtl, gtv):
            a = max_iou_assign(anchors, gt, gtv, gtl, pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0.0)
            pos = a.assigned_gt_inds > 0
            labels = jnp.where(pos, a.labels, self.num_classes)
            # OHEM 3:1 negatives like the reference YOLACTHead
            ce = softmax_cross_entropy(cls_i, labels)
            neg = a.assigned_gt_inds == 0
            neg_rank = jnp.argsort(jnp.argsort(
                jnp.where(neg, -ce, jnp.inf)))
            n_pos = jnp.sum(pos)
            neg_sel = neg & (neg_rank < 3 * jnp.maximum(n_pos, 1))
            w_cls = (pos | neg_sel).astype(jnp.float32)
            cls_l = jnp.sum(ce * w_cls)
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            t = bbox2delta(anchors, gt[m])
            pos_f = pos.astype(jnp.float32)
            reg_l = smooth_l1_loss(reg_i, t,
                                   weight=jnp.broadcast_to(
                                       pos_f[:, None], reg_i.shape),
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos_f), pos, m

        cls_l, reg_l, npos, pos_b, m_b = jax.vmap(per_image)(
            cls, reg, coef, protos, batch['gt_bboxes'],
            batch['gt_labels'], batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        losses = dict(loss_cls=jnp.sum(cls_l) / denom,
                      loss_bbox=1.5 * jnp.sum(reg_l) / denom)

        if gm is not None:
            # mask loss on up to 100 positives per image — the reference
            # caps masks_to_train=100 (`yolact_head.py`); static top-k
            # gather keeps the (K, Hp, Wp) assembly small
            K = 100

            def mask_per_image(coef_i, protos_i, pos_i, m_i, gm_i, gt_i):
                k = min(K, coef_i.shape[0])
                score = pos_i + jnp.arange(
                    coef_i.shape[0], 0, -1) * 1e-9   # stable, pos first
                _, sel = jax.lax.top_k(score, k)
                w = pos_i[sel]                            # (K,)
                cf = coef_i[sel]
                mi = m_i[sel]
                asm = jnp.einsum('nk,hwk->nhw', cf,
                                 protos_i.astype(jnp.float32))
                tgt = gm_i[mi].astype(jnp.float32)        # (K, Hp, Wp)
                bce = binary_cross_entropy(asm, tgt, reduction='none')
                # crop to gt box (coordinate mask at proto res, stride 4)
                hp, wp = protos_i.shape[:2]
                ys = (jnp.arange(hp) + 0.5) * 4.0
                xs = (jnp.arange(wp) + 0.5) * 4.0
                box = gt_i[mi]
                inside = ((xs[None, None, :] >= box[:, 0, None, None])
                          & (xs[None, None, :] <= box[:, 2, None, None])
                          & (ys[None, :, None] >= box[:, 1, None, None])
                          & (ys[None, :, None] <= box[:, 3, None, None]))
                per = jnp.sum(bce * inside, axis=(1, 2)) / \
                    jnp.maximum(jnp.sum(inside, axis=(1, 2)), 1.0)
                return jnp.sum(per * w)

            mask_l = jax.vmap(mask_per_image)(
                coef, protos, pos_b.astype(jnp.float32), m_b, gm,
                batch['gt_bboxes'])
            losses['loss_mask'] = 6.125 * jnp.sum(mask_l) / denom

            # semantic head loss: per-class BCE against union of gt masks
            def segm_per_image(segm_i, gm_i, gtl_i, gtv_i):
                hs, ws = segm_i.shape[:2]
                gmr = jax.image.resize(
                    gm_i.astype(jnp.float32),
                    (gm_i.shape[0], hs, ws), method='nearest')
                onehot = jax.nn.one_hot(jnp.clip(gtl_i, 0,
                                                 self.num_classes - 1),
                                        self.num_classes) * gtv_i[:, None]
                tgt = jnp.clip(jnp.einsum('ghw,gc->hwc', gmr, onehot),
                               0, 1)
                return jnp.mean(binary_cross_entropy(segm_i, tgt,
                                                     reduction='none'))

            segm_l = jax.vmap(segm_per_image)(
                segm, gm, batch['gt_labels'], batch['gt_valid'])
            losses['loss_segm'] = jnp.mean(segm_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, coef, protos, _, anchors = self._forward(batch['image'])
        cfg = self.test_cfg
        C = self.num_classes

        def per_image(cls_i, reg_i, coef_i, protos_i, shape_i):
            probs = jax.nn.softmax(cls_i.astype(jnp.float32),
                                   axis=-1)[:, :C]
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            a_idx = idx // C
            labels = (idx % C).astype(jnp.int32)
            boxes = delta2bbox(anchors[a_idx], reg_i[a_idx])
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            if self.use_fast_nms:
                keep = fast_nms_keep(boxes, top, labels,
                                     cfg.nms_iou_threshold)
            else:
                keep, _ = batched_nms(boxes, top, labels,
                                      cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            mm = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, mm)
            valid = sc > NEG_INF / 2
            det_boxes = boxes[sel] * valid[:, None]
            dets = jnp.concatenate(
                [det_boxes, jnp.where(valid, sc, 0.0)[:, None]], -1)
            # assemble masks for the kept detections
            cf = coef_i[a_idx][sel]
            masks = jax.nn.sigmoid(jnp.einsum(
                'nk,hwk->nhw', cf, protos_i.astype(jnp.float32)))
            hp, wp = protos_i.shape[:2]
            ys = (jnp.arange(hp) + 0.5) * 4.0
            xs = (jnp.arange(wp) + 0.5) * 4.0
            inside = ((xs[None, None, :] >= det_boxes[:, 0, None, None])
                      & (xs[None, None, :] <= det_boxes[:, 2, None, None])
                      & (ys[None, :, None] >= det_boxes[:, 1, None, None])
                      & (ys[None, :, None] <= det_boxes[:, 3, None, None]))
            masks = (masks * inside) > 0.5
            return dets, jnp.where(valid, labels[sel], 0), valid, masks

        dets, labels, valid, masks = jax.vmap(per_image)(
            cls, reg, coef, protos, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid, masks=masks)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
