"""Faster R-CNN R50-FPN (reference `configs/faster_rcnn/faster_rcnn_r50_fpn_
1x_coco.py` model shape — the model-zoo headline, `docs/model_zoo.md`).

Multi-level RPN (P2–P6, 3 anchors/location) + FPN RoI head with scale-based
level mapping. All level lists are flattened to single static tensors so the
single-level loss machinery applies unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import flatten_level_preds
from ..dense_heads.rpn_head import (ProposalConfig, RPNTrainConfig, rpn_loss,
                                    rpn_proposals)
from ..necks.fpn import FPN
from ..necks.build import make_fpn_neck
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats_fpn,
                                           extract_roi_feats_groie,
                                           roi_head_predict, sample_rois)


class FPNRPNHead(nn.Module):
    """Shared RPN convs applied per level (reference RPNHead over FPN)."""

    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats) -> Tuple[Tuple, Tuple]:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name='rpn_reg')
        cls_out, reg_out = [], []
        for f in feats:
            t = nn.relu(conv(f))
            cls_out.append(cls(t))
            reg_out.append(reg(t))
        return tuple(cls_out), tuple(reg_out)


@DETECTORS.register_module()
class FasterRCNNFPN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    neck_type: str = 'FPN'  # configs/pafpn|nas_fpn|carafe|fpg|libra_rcnn
    roi_extractor_type: str = 'single'  # 'groie' → configs/groie
    # 'align' | 'dpool' | 'mdpool' (configs/dcn faster_rcnn_r50_fpn_
    # {dpool,mdpool}_1x rows — deformable RoI pooling, ops/roi_pool.py)
    roi_layer: str = 'align'
    frozen_stages: int = 1
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                      max_per_img=1000)
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                  max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    neck_channels: int = 256      # configs/fpg chn128 rows
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = make_fpn_neck(
            self.neck_type, in_channels=self.backbone.stage_channels(),
            out_channels=self.neck_channels, num_outs=5, dtype=self.dtype)
        self.rpn_head = FPNRPNHead(dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=self.neck_channels,
            dtype=self.dtype)
        if self.roi_layer in ('dpool', 'mdpool'):
            import flax.linen as nn
            k = 7 * 7 * (3 if self.roi_layer == 'mdpool' else 2)
            # zero-init like mmcv DeformRoIPoolPack's offset fc
            self.dpool_offset_fc = nn.Dense(
                k, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name='dpool_offset_fc')

    @property
    def _roi_extract(self):
        if self.roi_layer in ('dpool', 'mdpool'):
            return self._dpool_extract
        return (extract_roi_feats_groie
                if self.roi_extractor_type == 'groie'
                else extract_roi_feats_fpn)

    def _dpool_extract(self, feats, rois, out_size: int = 7, **kw):
        """Deformable RoI pooling (reference mmcv DeformRoIPoolPack /
        ModulatedDeformRoIPoolPack; configs/dcn dpool/mdpool rows): base
        RoIAlign feats feed a zero-init offset fc, then the deformable
        re-pool samples at offset bins."""
        from ...ops.roi_pool import deform_roi_pool_fpn
        base = extract_roi_feats_fpn(feats, rois, out_size=out_size, **kw)
        b, r = rois.shape[:2]
        pred = self.dpool_offset_fc(base.reshape(b, r, -1))
        pred = pred.astype(jnp.float32)
        off = pred[..., :2 * out_size * out_size].reshape(
            b, r, out_size, out_size, 2)
        out = deform_roi_pool_fpn(feats, rois, off, out_size=out_size)
        if self.roi_layer == 'mdpool':
            mask = jax.nn.sigmoid(
                pred[..., 2 * out_size * out_size:]).reshape(
                    b, r, out_size, out_size, 1)
            out = out * mask
        return out.astype(base.dtype)

    def _flat_rpn(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_levels, reg_levels = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.rpn_strides),
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes), axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        losses = rpn_loss(cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4),
                          anchors, batch['gt_bboxes'], batch['gt_valid'],
                          batch['img_shape'], self.make_rng('sampler'),
                          self.rpn_train_cfg)
        proposals, _, prop_valid = rpn_proposals(
            jax.lax.stop_gradient(cls).reshape(b, n, 1, 1),
            jax.lax.stop_gradient(reg).reshape(b, n, 1, 4),
            anchors, batch['img_shape'], self.rpn_proposal_cfg)
        score_fn = None
        if self.roi_train_cfg.sampler_type == 'ohem':
            # preliminary bbox-head forward over all candidates ranks
            # hardness (reference OHEMSampler, `ohem_sampler.py:31`)
            score_fn = lambda rois: self.bbox_head(
                self._roi_extract(feats, rois))[0]
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg, score_fn=score_fn)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                self.roi_train_cfg))
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        proposals, _, prop_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        return roi_head_predict(
            self.bbox_head,
            feats, proposals, prop_valid, batch['img_shape'],
            self.num_classes, featmap_stride=0,  # unused with extractor below
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
