"""YOLOF (reference `mmdet/models/detectors/yolof.py` +
`mmdet/models/dense_heads/yolof_head.py`): single C5 level through the
DilatedEncoder, 5 anchors per cell, uniform matching.

The head is the reference's decoupled tower: 2 cls convs vs 4 reg convs,
with the objectness-implicit formulation (cls score = cls · obj, in log
space via `logsumexp` normalization `yolof_head.py:forward`).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.extra_assigners import uniform_assign
from ...core.bbox.transforms import delta2bbox
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       dense_anchor_predict)
from ..layers.norm import FrozenBatchNorm
from ..losses import giou_loss, sigmoid_focal_loss
from ..necks.zoo_necks import DilatedEncoder


@HEADS.register_module()
class YOLOFHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 512
    num_anchors: int = 5
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        c = feat
        for i in range(self.num_cls_convs):
            c = nn.relu(FrozenBatchNorm(self.in_channels,
                                        name=f'cls_bn{i}')(
                nn.Conv(self.in_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'cls_conv{i}')(c)))
        r = feat
        for i in range(self.num_reg_convs):
            r = nn.relu(FrozenBatchNorm(self.in_channels,
                                        name=f'reg_bn{i}')(
                nn.Conv(self.in_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'reg_conv{i}')(r)))
        cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                      padding=[(1, 1)] * 2,
                      bias_init=nn.initializers.constant(-4.595),
                      dtype=self.dtype, name='cls_score')(c)
        reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=[(1, 1)] * 2,
                      dtype=self.dtype, name='bbox_pred')(r)
        obj = nn.Conv(self.num_anchors, (3, 3), padding=[(1, 1)] * 2,
                      dtype=self.dtype, name='object_pred')(r)

        # implicit objectness (`yolof_head.py:forward_single`)
        b, h, w, _ = cls.shape
        cls = cls.reshape(b, h, w, self.num_anchors, self.num_classes)
        obj = obj.reshape(b, h, w, self.num_anchors, 1)
        norm = cls + obj - jnp.log(
            1. + jnp.clip(jnp.exp(cls.astype(jnp.float32)), a_max=1e8)
            + jnp.clip(jnp.exp(obj.astype(jnp.float32)), a_max=1e8))
        return norm.reshape(b, h, w, -1), reg


@DETECTORS.register_module()
class YOLOF(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    anchor_scales: Tuple[int, ...] = (1, 2, 4, 8, 16)
    stride: int = 32
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(3,),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = DilatedEncoder(in_channels=2048, out_channels=512,
                                   block_mid_channels=128, dtype=self.dtype)
        self.bbox_head = YOLOFHead(num_classes=self.num_classes,
                                   dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_map, reg_map = self.bbox_head(feats[0])
        h, w = cls_map.shape[1:3]
        gen = AnchorGenerator(strides=[self.stride], ratios=[1.0],
                              scales=list(self.anchor_scales))
        anchors = jnp.asarray(gen.grid_priors([(h, w)])[0])
        b = cls_map.shape[0]
        cls = cls_map.reshape(b, -1, self.num_classes)
        reg = reg_map.reshape(b, -1, 4).astype(jnp.float32)
        return cls, reg, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            boxes_pred = delta2bbox(anchors, reg_i)
            a = uniform_assign(jax.lax.stop_gradient(boxes_pred), anchors,
                               gt, gtv, gtl)
            pos = a.assigned_gt_inds > 0
            labels = jnp.where(pos, a.labels,
                               jnp.where(a.assigned_gt_inds == 0,
                                         self.num_classes, -1))
            w_cls = (labels >= 0).astype(jnp.float32)
            cls_l = sigmoid_focal_loss(
                cls_i, jnp.where(labels >= 0, labels, self.num_classes),
                weight=w_cls[:, None], reduction='sum')
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            pos_f = pos.astype(jnp.float32)
            reg_l = giou_loss(boxes_pred, gt[m], weight=pos_f,
                              reduction='sum')
            return cls_l, reg_l, jnp.sum(pos_f)

        cls_l, reg_l, npos = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox=jnp.sum(reg_l) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        return dense_anchor_predict(cls, reg, anchors, batch['img_shape'],
                                    self.num_classes, self.test_cfg)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
