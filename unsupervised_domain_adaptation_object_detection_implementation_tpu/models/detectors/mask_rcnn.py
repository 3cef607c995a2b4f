"""Mask R-CNN (reference `mmdet/models/detectors/mask_rcnn.py` +
`StandardRoIHead` with mask branch).

FasterRCNN-FPN plus an FCN mask head. Mask targets come from box-frame gt
rasters (see `roi_heads/mask_head.py`) — no ragged BitmapMasks anywhere.
Prediction returns per-detection 28×28 mask logits; pasting to image
resolution happens on the host (`paste_masks`).
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
from ..roi_heads.mask_head import (FCNMaskHead, mask_loss,
                                   mask_targets_from_box_frame)
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats_fpn,
                                           extract_roi_feats_groie,
                                           roi_head_predict, sample_rois,
                                           seesaw_activation,
                                           seesaw_cls_losses)
from .faster_rcnn_fpn import FPNRPNHead


@DETECTORS.register_module()
class MaskRCNN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    neck_type: str = 'FPN'  # configs/pafpn|nas_fpn|carafe|fpg|libra_rcnn
    roi_extractor_type: str = 'single'  # 'groie' → configs/groie
    # 'softmax' (default CE) | 'seesaw' (configs/seesaw_loss: NormedLinear
    # K+2 head, seesaw CE + objectness CE, running per-class counts kept
    # in the batch_stats collection so the jitted train step updates them)
    loss_cls: str = 'softmax'
    # seesaw `*_normed_mask_*` rows: NormedConv2d mask predictor
    normed_mask: bool = False
    frozen_stages: int = 1
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                      max_per_img=1000)
    rpn_test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096,
                                                  max_per_img=1000)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    mask_size: int = 28
    # configs/fpg chn128 rows: neck (and heads, via flax shape inference)
    # at a narrower width
    neck_channels: int = 256
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
            seesaw=self.loss_cls == 'seesaw', dtype=self.dtype)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     normed_predictor=self.normed_mask,
                                     dtype=self.dtype)
        if self.loss_cls == 'seesaw':
            self.seesaw_cum = self.variable(
                'batch_stats', 'seesaw_cum_samples',
                lambda: jnp.zeros((self.num_classes,), jnp.float32))

    @property
    def _roi_extract(self):
        return (extract_roi_feats_groie
                if self.roi_extractor_type == 'groie'
                else extract_roi_feats_fpn)

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
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        roi_feats = self._roi_extract(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        if self.loss_cls == 'seesaw':
            # reg from the standard path; cls replaced by seesaw CE +
            # objectness CE (grad flows only through the dict entries kept)
            det_losses = bbox_loss(cls_s[..., :self.num_classes + 1],
                                   reg_s, sampled, self.num_classes,
                                   self.roi_train_cfg)
            ss, new_cum = seesaw_cls_losses(cls_s, sampled,
                                            self.num_classes,
                                            self.seesaw_cum.value)
            self.seesaw_cum.value = new_cum
            det_losses.update(ss)
            losses.update(det_losses)
        else:
            losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                    self.roi_train_cfg))
        # mask branch on the SAME sampled RoIs (positives weighted) — a
        # static-shape simplification of mmdet's pos-only mask forward
        mask_feats = self._roi_extract(feats, sampled.rois,
                                       out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        targets = mask_targets_from_box_frame(
            batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
            sampled.matched_gt, self.mask_size)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        losses.update(mask_loss(mask_logits, targets, sampled.labels, pos_w))
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        proposals, _, prop_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        if self.loss_cls == 'seesaw':
            def bbox_head_apply(f):
                cls, reg, feat = self.bbox_head(f)
                return seesaw_activation(cls, self.num_classes), reg, feat
        else:
            bbox_head_apply = self.bbox_head
        out = roi_head_predict(
            bbox_head_apply, feats, proposals, prop_valid,
            batch['img_shape'],
            self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: self._roi_extract(f, r))
        # mask logits for the final detections
        det_boxes = out['dets'][..., :4]
        mask_feats = self._roi_extract(feats, det_boxes,
                                       out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)       # (B, D, 2s, 2s, C)
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            mask_logits, lbl[..., None, None, None], axis=-1)[..., 0]
        out['masks'] = jax.nn.sigmoid(sel.astype(jnp.float32))
        return out

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)


def paste_masks(masks: np.ndarray, boxes: np.ndarray, img_h: int,
                img_w: int, thr: float = 0.5) -> np.ndarray:
    """Host-side mask pasting (reference `FCNMaskHead.get_seg_masks`):
    (D, m, m) probs + (D, 4) boxes → (D, img_h, img_w) bool."""
    from PIL import Image
    out = np.zeros((len(masks), img_h, img_w), bool)
    for i, (m, box) in enumerate(zip(masks, boxes)):
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)
        resized = np.asarray(Image.fromarray(
            (m * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
        xs, ys = max(x1, 0), max(y1, 0)
        xe, ye = min(x2, img_w), min(y2, img_h)
        if xe > xs and ye > ys:
            crop = resized[ys - y1:ye - y1, xs - x1:xe - x1]
            out[i, ys:ye, xs:xe] = crop >= thr * 255
    return out
