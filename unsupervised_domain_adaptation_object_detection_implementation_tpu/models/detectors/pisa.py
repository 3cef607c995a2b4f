"""PISA heads (reference `mmdet/models/dense_heads/pisa_retinanet_head.py`
+ `pisa_ssd_head.py` + `models/losses/pisa_loss.py`).

Prime Sample Attention on RetinaNet / SSDLite: positive classification
losses are reweighted by IoU Hierarchical Local Rank (ISR-P) and the
regression loss carries classification-aware weights (CARL). The
assignment and heads are the parents'; only the loss weighting changes —
expressed as dense per-anchor weight vectors (no gathering of positives).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.transforms import bbox2delta, delta2bbox
from ...core.bbox.iou import bbox_overlaps
from ...utils.registry import DETECTORS
from ..dense_heads.anchor_head import anchor_inside_flags
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..losses.extra_losses import carl_weights, isr_p_weights
from .retinanet import RetinaNet
from .ssd import SSD, SSDLite
from .faster_rcnn_fpn import FasterRCNNFPN
from .mask_rcnn import MaskRCNN


def pisa_anchor_loss(cls_logits, reg_preds, anchors, gt_bboxes, gt_labels,
                     gt_valid, img_shape, num_classes, cfg,
                     isr_k=2.0, isr_bias=0.0, carl_k=1.0, carl_bias=0.2
                     ) -> Dict[str, jnp.ndarray]:
    """Focal/Smooth-L1 anchor loss with ISR-P + CARL weighting
    (`pisa_loss.py:isr_p`, `carl_loss`)."""

    def per_image(cls_i, reg_i, gt_i, gtl_i, gtv_i, shape_i):
        inside = anchor_inside_flags(anchors, shape_i, cfg.allowed_border)
        assign = max_iou_assign(
            anchors, gt_i, gtv_i, gtl_i,
            pos_iou_thr=cfg.pos_iou_thr, neg_iou_thr=cfg.neg_iou_thr,
            min_pos_iou=cfg.min_pos_iou,
            match_low_quality=cfg.match_low_quality, prior_valid=inside)
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        labels = jnp.where(pos, assign.labels, num_classes)
        m = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_i.shape[0] - 1)
        matched_gt = gt_i[m]

        # decoded-box IoU with the matched gt for ranking (reference uses
        # the current predictions' IoUs for the HLR)
        boxes = delta2bbox(anchors,
                           jax.lax.stop_gradient(reg_i).astype(jnp.float32),
                           cfg.target_means, cfg.target_stds)
        ious = jax.vmap(lambda b, g: bbox_overlaps(b[None], g[None])[0, 0])(
            boxes, matched_gt)

        isr = isr_p_weights(jnp.zeros_like(ious), ious,
                            jnp.clip(assign.labels, 0, num_classes - 1),
                            pos, num_classes, k=isr_k, bias=isr_bias)
        cls_w = jnp.where(pos, isr, (neg).astype(jnp.float32))
        cls_loss = sigmoid_focal_loss(
            cls_i, labels, weight=cls_w, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha, reduction='sum')

        # CARL: weight regression by the predicted own-class probability
        p_cls = jax.nn.sigmoid(jax.lax.stop_gradient(
            cls_i.astype(jnp.float32)))
        own = jnp.take_along_axis(
            p_cls, jnp.clip(assign.labels, 0, num_classes - 1)[:, None],
            axis=1)[:, 0]
        carl = carl_weights(own, pos, k=carl_k, bias=carl_bias)
        targets = bbox2delta(anchors, matched_gt, cfg.target_means,
                             cfg.target_stds)
        reg_loss = smooth_l1_loss(
            reg_i, targets, weight=(carl * pos)[:, None],
            beta=1.0 / 9.0, reduction='sum')
        return cls_loss, reg_loss, jnp.sum(pos)

    cls_l, reg_l, n_pos = jax.vmap(per_image)(
        cls_logits, reg_preds, gt_bboxes, gt_labels, gt_valid, img_shape)
    denom = jnp.maximum(jnp.sum(n_pos), 1.0)
    return dict(loss_cls=jnp.sum(cls_l) / denom,
                loss_bbox=jnp.sum(reg_l) / denom)


@DETECTORS.register_module()
class PISARetinaNet(RetinaNet):
    """`pisa_retinanet_head.py:12` on our RetinaNet."""

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg, anchors = self._forward_flat(batch['image'])
        return pisa_anchor_loss(cls, reg, anchors, batch['gt_bboxes'],
                                batch['gt_labels'], batch['gt_valid'],
                                batch['img_shape'], self.num_classes,
                                self.train_cfg)


@DETECTORS.register_module()
class PISASSDLite(SSDLite):
    """`pisa_ssd_head.py:11` on the SSDLite head: the hard-negative-mined
    softmax CE gets ISR-P weights on positives; the box loss gets CARL."""

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from ..losses.cross_entropy_loss import softmax_cross_entropy
        cls, reg, anchors = self._forward_flat(batch['image'])
        C = self.num_classes

        def per_image(cls_i, reg_i, gt, gtl, gtv):
            assign = max_iou_assign(anchors, gt, gtv, gtl,
                                    pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.0, match_low_quality=True)
            pos = assign.assigned_gt_inds > 0
            neg = assign.assigned_gt_inds == 0
            labels = jnp.where(pos, assign.labels, C)
            m = jnp.clip(assign.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            matched_gt = gt[m]
            ce = softmax_cross_entropy(cls_i.astype(jnp.float32), labels)
            n_pos = jnp.sum(pos)
            order = jnp.argsort(-jnp.where(neg, ce, -jnp.inf))
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            neg_sel = neg & (rank < self.neg_pos_ratio * n_pos)

            boxes = delta2bbox(
                anchors, jax.lax.stop_gradient(reg_i).astype(jnp.float32))
            ious = jax.vmap(lambda b, g: bbox_overlaps(
                b[None], g[None])[0, 0])(boxes, matched_gt)
            isr = isr_p_weights(jnp.zeros_like(ious), ious,
                                jnp.clip(assign.labels, 0, C - 1),
                                pos, C)
            w = jnp.where(pos, isr, neg_sel.astype(jnp.float32))
            cls_l = jnp.sum(ce * w)

            probs = jax.nn.softmax(jax.lax.stop_gradient(
                cls_i.astype(jnp.float32)), -1)
            own = jnp.take_along_axis(
                probs, jnp.clip(assign.labels, 0, C - 1)[:, None],
                axis=1)[:, 0]
            carl = carl_weights(own, pos)
            targets = bbox2delta(anchors, matched_gt)
            reg_l = smooth_l1_loss(reg_i, targets,
                                   weight=(carl * pos)[:, None],
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, n_pos

        cls_l, reg_l, n_pos = jax.vmap(per_image)(
            cls, reg, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(n_pos), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / denom,
                    loss_bbox=jnp.sum(reg_l) / denom)


@DETECTORS.register_module()
class PISASSD(SSD):
    """PISA on the VGG-16 SSD tower (reference
    `configs/pisa/pisa_ssd300_coco.py`, `pisa_ssd512_coco.py`): identical
    ISR-P + CARL loss as PISASSDLite, different trunk/anchors."""

    loss = PISASSDLite.loss


@DETECTORS.register_module()
class PISAFasterRCNN(FasterRCNNFPN):
    """Two-stage PISA (reference `mmdet/models/roi_heads/pisa_roi_head.py`):
    standard FPN Faster R-CNN whose RoI classification loss carries ISR-P
    weights and whose regression carries CARL."""

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        losses, _, _ = _pisa_two_stage_losses(self, batch)
        return losses


def _pisa_two_stage_losses(self, batch):
    """Shared RPN + ISR-P/CARL RoI losses for the two-stage PISA rows;
    returns (losses, feats, sampled) so PISAMaskRCNN can append its mask
    branch on the same sampled RoIs."""
    from ..dense_heads.rpn_head import rpn_loss, rpn_proposals
    from ..roi_heads.standard_roi_head import (extract_roi_feats_fpn,
                                               sample_rois)
    from ..losses.cross_entropy_loss import softmax_cross_entropy
    if True:
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
        roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        C = self.num_classes

        def per_image(cls_i, reg_i, sampled_i, gt):
            rois, labels, lvalid, is_pos, reg_t, m = sampled_i
            ce = softmax_cross_entropy(cls_i.astype(jnp.float32), labels)
            boxes = delta2bbox(
                rois, jax.lax.stop_gradient(reg_i).astype(jnp.float32),
                stds=self.roi_train_cfg.target_stds)
            matched_gt = gt[m]
            ious = jax.vmap(lambda bx, g: bbox_overlaps(
                bx[None], g[None])[0, 0])(boxes, matched_gt)
            isr = isr_p_weights(jnp.zeros_like(ious), ious,
                                jnp.clip(labels, 0, C - 1), is_pos, C)
            w = jnp.where(is_pos, isr, lvalid.astype(jnp.float32))
            cls_l = jnp.sum(ce * w)
            probs = jax.nn.softmax(jax.lax.stop_gradient(
                cls_i.astype(jnp.float32)), -1)
            own = jnp.take_along_axis(
                probs, jnp.clip(labels, 0, C - 1)[:, None], axis=1)[:, 0]
            carl = carl_weights(own, is_pos)
            reg_l = smooth_l1_loss(reg_i, reg_t,
                                   weight=(carl * is_pos)[:, None],
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, jnp.sum(lvalid)

        reg_sel = reg_s
        if reg_s.shape[-1] != 4:
            lbl = jnp.clip(sampled.labels, 0, C - 1)
            reg_sel = jnp.take_along_axis(
                reg_s.reshape(*sampled.labels.shape, C, 4),
                lbl[..., None, None].repeat(4, -1), axis=2)[..., 0, :]
        cls_l, reg_l, cnt = jax.vmap(per_image)(
            cls_s, reg_sel, sampled, batch['gt_bboxes'])
        denom = jnp.maximum(jnp.sum(cnt), 1.0)
        losses.update(loss_cls=jnp.sum(cls_l) / denom,
                      loss_bbox=jnp.sum(reg_l) / denom)
        return losses, feats, sampled


@DETECTORS.register_module()
class PISAMaskRCNN(MaskRCNN):
    """PISA on Mask R-CNN (reference `configs/pisa/pisa_mask_rcnn_r50_fpn_
    1x_coco.py` via `pisa_roi_head.py`): ISR-P/CARL bbox losses + the
    standard mask branch on the same sampled RoIs."""

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from ..roi_heads.mask_head import (mask_loss,
                                           mask_targets_from_box_frame)
        losses, feats, sampled = _pisa_two_stage_losses(self, batch)
        mask_feats = self._roi_extract(feats, sampled.rois,
                                       out_size=self.mask_size // 2)
        mask_logits = self.mask_head(mask_feats)
        targets = mask_targets_from_box_frame(
            batch['gt_masks'], batch['gt_bboxes'], sampled.rois,
            sampled.matched_gt, self.mask_size)
        pos_w = (sampled.is_pos & sampled.label_valid).astype(jnp.float32)
        losses.update(mask_loss(mask_logits, targets, sampled.labels, pos_w))
        return losses
