"""FreeAnchor (reference `mmdet/models/dense_heads/free_anchor_retina_head.py`
on the RetinaNet trunk).

Learning-to-match: each gt owns a bag of its `pre_anchor_topk` highest-IoU
anchors; the positive loss is the negative log of a mean-max weighted bag
probability P(cls)·P(loc); the negative loss is a focal-shaped penalty on
cls probability scaled by (1 − P(a is some gt's best match)), where the
per-anchor "object covered" probability comes from the saturated-linear
IoU transform.

TPU shape: bags are a static (G, K) gather from the dense IoU matrix; the
reference's per-image python loop over gts is one vmap; `object_box_prob`'s
sparse max over gts is a dense masked max.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.iou import bbox_overlaps
from ...core.bbox.transforms import bbox2delta, delta2bbox
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       dense_anchor_predict,
                                       flatten_level_preds)
from ..necks.fpn import FPN
from .retinanet import RetinaHead


@DETECTORS.register_module()
class FreeAnchor(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    pre_anchor_topk: int = 50
    smooth_l1_beta: float = 0.11
    gamma: float = 2.0
    alpha: float = 0.5
    bbox_thr: float = 0.6
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
        self.bbox_head = RetinaHead(num_classes=self.num_classes,
                                    dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides),
                              ratios=[0.5, 1.0, 2.0],
                              scales=[4 * 2**(i / 3) for i in range(3)])
        anchors = jnp.asarray(
            np.concatenate(gen.grid_priors(sizes), axis=0))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg = flatten_level_preds(reg_lv, 4)
        return cls, reg, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        K = self.pre_anchor_topk
        C = self.num_classes

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            p_cls = jax.nn.sigmoid(cls_i.astype(jnp.float32))   # (N, C)
            boxes = delta2bbox(anchors, reg_i.astype(jnp.float32))
            ious = bbox_overlaps(gt, anchors)                   # (G, N)
            ious = jnp.where(gtv[:, None], ious, -1.0)

            # ---- negative loss: object_box_prob per anchor
            # saturated linear transform of IoU (free_anchor paper eq. 6)
            pred_ious = bbox_overlaps(gt, jax.lax.stop_gradient(boxes))
            t1 = self.bbox_thr
            t2 = jnp.clip(jnp.max(jnp.where(gtv[:, None], pred_ious, 0.0),
                                  axis=1, keepdims=True), t1 + 1e-12, None)
            obj_box_prob = jnp.clip((pred_ious - t1) / (t2 - t1), 0, 1)
            obj_box_prob = jnp.where(gtv[:, None], obj_box_prob, 0.0)
            # P(class c covered at anchor n) = max over gts of that class
            cls_onehot = jax.nn.one_hot(
                jnp.clip(gtl, 0, C - 1), C) * gtv[:, None]      # (G, C)
            obj_cls_prob = jnp.einsum('gn,gc->nc',
                                      obj_box_prob, cls_onehot)
            obj_cls_prob = jnp.clip(obj_cls_prob, 0, 1)
            neg_prob = p_cls * (1 - obj_cls_prob)
            neg_l = -(1 - self.alpha) * neg_prob**self.gamma * \
                jnp.log(jnp.clip(1 - neg_prob, 1e-12, None))
            neg_loss = jnp.sum(neg_l)

            # ---- positive bag loss
            k = min(K, anchors.shape[0])
            top_iou, top_idx = jax.lax.top_k(ious, k)            # (G, K)
            bag_cls = p_cls[top_idx, jnp.clip(gtl, 0, C - 1)[:, None]]
            # localization prob: exp(-smoothl1(delta_pred, delta_target))
            d_t = bbox2delta(anchors[top_idx],
                             jnp.broadcast_to(gt[:, None, :],
                                              (gt.shape[0], k, 4)))
            d_p = reg_i[top_idx].astype(jnp.float32)
            diff = jnp.abs(d_p - d_t)
            sl1 = jnp.where(diff < self.smooth_l1_beta,
                            0.5 * diff**2 / self.smooth_l1_beta,
                            diff - 0.5 * self.smooth_l1_beta)
            bag_loc = jnp.exp(-jnp.sum(sl1, axis=-1) * 1.0)      # (G, K)
            joint = jnp.clip(bag_cls * bag_loc, 1e-12, 1 - 1e-6)
            # mean-max: w_i = 1/(1-x_i) normalized
            w = 1.0 / (1.0 - joint)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            bag_prob = jnp.sum(joint * w, axis=1)
            pos_l = -self.alpha * jnp.log(jnp.clip(bag_prob, 1e-12, None))
            pos_loss = jnp.sum(jnp.where(gtv, pos_l, 0.0))
            return pos_loss, neg_loss, jnp.sum(gtv)

        pos_l, neg_l, ngt = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        n = jnp.maximum(jnp.sum(ngt), 1.0)
        return dict(positive_bag_loss=jnp.sum(pos_l) / n,
                    negative_bag_loss=jnp.sum(neg_l) / (n * K))

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        return dense_anchor_predict(cls, reg, anchors, batch['img_shape'],
                                    self.num_classes, self.test_cfg)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
