"""SABL RetinaNet (reference `mmdet/models/dense_heads/sabl_retina_head.py`
+ `core/bbox/coder/bucketing_bbox_coder.py`).

Side-Aware Boundary Localization: classification on square anchors via an
ApproxMaxIoU-style assignment; localization predicts per-side bucket
logits (side_num per edge) plus in-bucket offsets, decoded by
`bucket2bbox` with bucketing-guided rescoring.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.extra_coders import bbox2bucket, bucket2bbox
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..necks.fpn import FPN

NUM_BUCKETS = 14
SIDE_NUM = 7   # ceil(NUM_BUCKETS / 2)


@HEADS.register_module()
class SABLRetinaHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='retina_cls')
        bucket_cls_out = nn.Conv(4 * SIDE_NUM, (3, 3),
                                 padding=[(1, 1)] * 2, dtype=self.dtype,
                                 name='bucket_cls')
        bucket_off_out = nn.Conv(4 * SIDE_NUM, (3, 3),
                                 padding=[(1, 1)] * 2, dtype=self.dtype,
                                 name='bucket_offset')
        cls_s, bc_s, bo_s = [], [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_s.append(cls_out(c))
            bc_s.append(bucket_cls_out(r).astype(jnp.float32))
            bo_s.append(bucket_off_out(r).astype(jnp.float32))
        return tuple(cls_s), tuple(bc_s), tuple(bo_s)


@DETECTORS.register_module()
class SABLRetinaNet(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    scale_factor: float = 1.7      # bucket region expansion
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
        self.bbox_head = SABLRetinaHead(num_classes=self.num_classes,
                                        dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, bc_lv, bo_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        # square anchors, one per cell (sabl uses square anchor scale 4)
        gen = AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                              scales=[4])
        anchors = jnp.asarray(
            np.concatenate(gen.grid_priors(sizes), axis=0))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        bc = flatten_level_preds(bc_lv, 4 * SIDE_NUM)
        bo = flatten_level_preds(bo_lv, 4 * SIDE_NUM)
        return cls, bc, bo, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, bc, bo, anchors = self._forward_flat(batch['image'])

        def per_image(cls_i, bc_i, bo_i, gt, gtl, gtv):
            a = max_iou_assign(anchors, gt, gtv, gtl, pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0.0)
            pos = a.assigned_gt_inds > 0
            labels = jnp.where(pos, a.labels, self.num_classes)
            cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            gt_m = gt[m]
            offs, offw, blabels, bclsw = bbox2bucket(
                anchors, gt_m, NUM_BUCKETS, self.scale_factor)
            pos_f = pos.astype(jnp.float32)[:, None]
            bce = binary_cross_entropy(bc_i, blabels, reduction='none')
            bcls_l = jnp.sum(bce * bclsw * pos_f)
            boff_l = smooth_l1_loss(bo_i, offs, weight=offw * pos_f,
                                    beta=1.0 / 9.0, reduction='sum')
            return cls_l, bcls_l, boff_l, jnp.sum(pos_f[:, 0])

        cls_l, bcls_l, boff_l, npos = jax.vmap(per_image)(
            cls, bc, bo, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox_cls=0.5 * jnp.sum(bcls_l) / denom,
                    loss_bbox_reg=jnp.sum(boff_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, bc, bo, anchors = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, bc_i, bo_i, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            a_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes, conf = bucket2bbox(anchors[a_idx], bc_i[a_idx],
                                      bo_i[a_idx], NUM_BUCKETS,
                                      self.scale_factor)
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            scores = top * conf               # bucketing-guided rescoring
            keep, _ = batched_nms(boxes, scores, labels,
                                  cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(keep, scores, NEG_INF)
            mm = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, mm)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(cls, bc, bo,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
