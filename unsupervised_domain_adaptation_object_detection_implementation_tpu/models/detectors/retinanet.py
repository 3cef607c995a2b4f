"""RetinaNet — the single-stage detector family representative
(reference `mmdet/models/detectors/retinanet.py` +
`mmdet/models/dense_heads/retina_head.py` + `single_stage.py:12`).

ResNet + FPN(P3–P7, extra convs on input) + shared 4-conv cls/reg subnets
with focal loss; one jitted program for the whole loss, multi-level anchors
flattened to a single static tensor (see `dense_heads.anchor_head`).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..backbones.resnet import ResNet
from ..dense_heads.anchor_head import (DenseAnchorTrainConfig,
                                       DensePredictConfig, MultiAnchorConfig,
                                       dense_anchor_predict,
                                       dense_focal_anchor_loss,
                                       flatten_level_preds)
from ..necks.fpn import FPN
from ..necks.build import make_fpn_neck


@HEADS.register_module()
class RetinaHead(nn.Module):
    """Shared 4-conv subnets → A*C cls / A*4 reg per level
    (reference `retina_head.py`)."""

    num_classes: int = 80
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        # prior-prob bias init (focal loss convention, -log((1-p)/p), p=.01)
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name='retina_cls')
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='retina_reg')
        cls_scores, bbox_preds = [], []
        for f in feats:
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return tuple(cls_scores), tuple(bbox_preds)


class RetinaSepBNHead(nn.Module):
    """Retina head with SHARED convs but SEPARATE per-level norms
    (reference `dense_heads/retina_sepbn_head.py` — NAS-FPN's head). The
    norm is our FrozenBatchNorm (norm_eval semantics), one instance per
    (level, conv)."""

    num_classes: int = 80
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..layers.norm import FrozenBatchNorm
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, use_bias=False,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, use_bias=False,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.595),
                          name='retina_cls')
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, dtype=self.dtype,
                          name='retina_reg')
        cls_scores, bbox_preds = [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for i, conv in enumerate(cls_convs):
                c = nn.relu(FrozenBatchNorm(
                    self.feat_channels, name=f'cls_bn{lvl}_{i}')(conv(c)))
            for i, conv in enumerate(reg_convs):
                r = nn.relu(FrozenBatchNorm(
                    self.feat_channels, name=f'reg_bn{lvl}_{i}')(conv(r)))
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return tuple(cls_scores), tuple(bbox_preds)


@DETECTORS.register_module()
class RetinaNet(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    neck_type: str = 'FPN'  # configs/pafpn|nas_fpn|carafe|fpg|libra_rcnn
    frozen_stages: int = 1
    anchor_cfg: MultiAnchorConfig = MultiAnchorConfig()
    train_cfg: DenseAnchorTrainConfig = DenseAnchorTrainConfig()
    test_cfg: DensePredictConfig = DensePredictConfig()
    sep_bn_head: bool = False     # reference retina_sepbn_head.py variant
    neck_channels: int = 256      # configs/fpg chn128 rows
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = make_fpn_neck(
            self.neck_type, in_channels=self.backbone.stage_channels(),
            out_channels=self.neck_channels, num_outs=5, start_level=1,
            add_extra_convs='on_input', dtype=self.dtype)
        head_cls = RetinaSepBNHead if self.sep_bn_head else RetinaHead
        self.bbox_head = head_cls(
            num_classes=self.num_classes,
            num_anchors=self.anchor_cfg.num_anchors, dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_levels, reg_levels = self.bbox_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        anchors = jnp.asarray(self.anchor_cfg.flat_anchors(sizes))
        cls = flatten_level_preds(cls_levels, self.num_classes)
        reg = flatten_level_preds(reg_levels, 4)
        return cls, reg, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        return dense_focal_anchor_loss(
            cls, reg, anchors, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'], batch['img_shape'], self.num_classes,
            self.train_cfg)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        return dense_anchor_predict(cls, reg, anchors, batch['img_shape'],
                                    self.num_classes, self.test_cfg)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
