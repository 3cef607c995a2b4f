"""SCNet (reference `mmdet/models/detectors/scnet.py` +
`mmdet/models/roi_heads/scnet_roi_head.py`).

Sample-Consistency Network — an HTC-style cascade with three changes:
1. the mask head runs ONCE (no per-stage mask heads / info flow),
2. a feature-relay head carries the final bbox head's shared FC feature
   into the mask branch as a spatial prior
   (`mask_heads/feature_relay_head.py`),
3. a global-context head does image-level multilabel classification over
   present classes and its pooled feature is broadcast-added to box and
   mask RoI features (`mask_heads/global_context_head.py`).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox.transforms import clip_boxes, delta2bbox
from ...utils.registry import DETECTORS
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..roi_heads.mask_head import mask_loss, mask_targets_from_box_frame
from ..roi_heads.standard_roi_head import (bbox_loss, extract_roi_feats_fpn,
                                           roi_head_predict, sample_rois)
from .htc import (HTC, STAGE_STDS, STAGE_WEIGHTS, HTCMaskHead)
from ..dense_heads.rpn_head import rpn_loss, rpn_proposals


class GlobalContextHead(nn.Module):
    """`global_context_head.py:12`: convs on the coarsest level → GAP →
    fc → per-class multilabel logits + a context feature vector."""

    num_classes: int = 80
    conv_out: int = 256
    fc_out: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_out, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f'conv{i}')(x))
        pooled = jnp.mean(x, axis=(1, 2))                    # (B, C)
        feat = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype,
                                name='fc')(pooled))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='fc_cls')(feat)
        return logits.astype(jnp.float32), feat


class FeatRelayHead(nn.Module):
    """`feature_relay_head.py:10`: shared-FC feature (B, S, 1024) →
    spatial (B, S, roi, roi, out_ch) prior for the mask branch."""

    roi_size: int = 14
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, shared_feat):
        b, s, _ = shared_feat.shape
        x = nn.relu(nn.Dense(self.roi_size * self.roi_size // 4
                             * self.out_channels, dtype=self.dtype,
                             name='fc')(shared_feat))
        x = x.reshape(b, s, self.roi_size // 2, self.roi_size // 2,
                      self.out_channels)
        x = jax.image.resize(
            x, (b, s, self.roi_size, self.roi_size, self.out_channels),
            method='bilinear')
        return x


@DETECTORS.register_module()
class SCNet(HTC):
    """Cascade + semantic branch from HTC; single mask head with feature
    relay and global context."""

    def setup(self):
        super().setup()
        self.glbctx_head = GlobalContextHead(num_classes=self.num_classes,
                                             dtype=self.dtype)
        self.relay_head = FeatRelayHead(roi_size=self.mask_size // 2,
                                        dtype=self.dtype)
        self.scnet_mask_head = HTCMaskHead(num_classes=self.num_classes,
                                           dtype=self.dtype,
                                           name='scnet_mask_head')

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

        sem_feat = None
        if self.with_semantic:
            _, sem_feat = self.semantic_head(feats)

        # global context: multilabel "which classes are present"
        ctx_logits, ctx_feat = self.glbctx_head(feats)
        present = jnp.any(
            jax.nn.one_hot(jnp.clip(batch['gt_labels'], 0,
                                    self.num_classes - 1),
                           self.num_classes)
            * batch['gt_valid'][..., None], axis=1).astype(jnp.float32)
        losses['loss_glbctx'] = 3.0 * binary_cross_entropy(
            ctx_logits, present, reduction='mean')

        boxes, box_valid = proposals, prop_valid
        last_sampled = None
        last_shared = None
        for i in range(3):
            cfg = self._stage_cfg(i)
            sampled = sample_rois(boxes, box_valid, batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_valid'],
                                  self.make_rng('sampler'),
                                  self.num_classes, cfg)
            roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
            if sem_feat is not None:
                roi_feats = roi_feats + self._semantic_roi(sem_feat,
                                                           sampled.rois)
            # broadcast global context onto each RoI's channel dim
            roi_feats = roi_feats + ctx_feat[:, None, None, None,
                                             :roi_feats.shape[-1]]
            cls_s, reg_s, shared = self.bbox_heads[i](roi_feats)
            for k, v in bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                  cfg).items():
                losses[f's{i}.{k}'] = v * STAGE_WEIGHTS[i]
            last_sampled, last_shared = sampled, shared
            refined = delta2bbox(
                sampled.rois,
                jax.lax.stop_gradient(reg_s).astype(jnp.float32),
                stds=cfg.target_stds)
            refined = clip_boxes(
                refined,
                batch['img_shape'][:, None, :].astype(jnp.float32))
            boxes, box_valid = refined, sampled.label_valid

        # single mask pass on the LAST stage's sampled rois, with relay
        sampled = last_sampled
        mfeats = extract_roi_feats_fpn(feats, sampled.rois,
                                       out_size=self.mask_size // 2)
        if sem_feat is not None:
            mfeats = mfeats + extract_roi_feats_fpn(
                (sem_feat,) * 5, sampled.rois, out_size=self.mask_size // 2)
        mfeats = mfeats + self.relay_head(last_shared).astype(mfeats.dtype)
        mask_logits, _ = self.scnet_mask_head(mfeats)
        targets = mask_targets_from_box_frame(
            batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
            sampled.matched_gt, self.mask_size)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        losses.update(mask_loss(mask_logits, targets, sampled.labels,
                                pos_w))
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        boxes, _, box_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        sem_feat = None
        if self.with_semantic:
            _, sem_feat = self.semantic_head(feats)
        _, ctx_feat = self.glbctx_head(feats)

        def enrich(rf, rois):
            if sem_feat is not None:
                rf = rf + self._semantic_roi(sem_feat, rois)
            return rf + ctx_feat[:, None, None, None, :rf.shape[-1]]

        score_sum = 0.0
        shared = None
        for i in range(3):
            roi_feats = enrich(extract_roi_feats_fpn(feats, boxes), boxes)
            cls_s, reg_s, shared = self.bbox_heads[i](roi_feats)
            score_sum = score_sum + jax.nn.softmax(
                cls_s.astype(jnp.float32), axis=-1)
            if i < 2:
                boxes = delta2bbox(boxes, reg_s.astype(jnp.float32),
                                   stds=STAGE_STDS[i])
                boxes = clip_boxes(
                    boxes,
                    batch['img_shape'][:, None, :].astype(jnp.float32))
        avg_scores = score_sum / 3.0
        out = roi_head_predict(
            lambda rf: (jnp.log(jnp.maximum(avg_scores, 1e-9)),
                        self.bbox_heads[2](rf)[1], None),
            feats, boxes, box_valid, batch['img_shape'], self.num_classes,
            featmap_stride=0, reg_class_agnostic=True,
            target_stds=STAGE_STDS[2], use_sigmoid_cls=False,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: enrich(extract_roi_feats_fpn(f, r),
                                              r))

        det_boxes = out['dets'][..., :4]
        mfeats = extract_roi_feats_fpn(feats, det_boxes,
                                       out_size=self.mask_size // 2)
        if sem_feat is not None:
            mfeats = mfeats + extract_roi_feats_fpn(
                (sem_feat,) * 5, det_boxes, out_size=self.mask_size // 2)
        rf = enrich(extract_roi_feats_fpn(feats, det_boxes), det_boxes)
        _, _, shared = self.bbox_heads[2](rf)
        mfeats = mfeats + self.relay_head(shared).astype(mfeats.dtype)
        logits, _ = self.scnet_mask_head(mfeats)
        lbl = jnp.clip(out['labels'], 0, self.num_classes - 1)
        out['masks'] = jax.nn.sigmoid(jnp.take_along_axis(
            logits, lbl[..., None, None, None], axis=-1)[..., 0])
        return out
