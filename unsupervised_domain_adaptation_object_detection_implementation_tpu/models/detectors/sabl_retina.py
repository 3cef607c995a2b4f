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


@HEADS.register_module()
class SABLBBoxHead(nn.Module):
    """Side-Aware Boundary Localization RoI head (reference
    `mmdet/models/roi_heads/bbox_heads/sabl_head.py:SABLHead`): a 2-fc
    classification branch plus a side-aware regression branch — conv
    stack on the 7×7 RoI map, max-pool to per-axis side features,
    transposed-conv ×2 upsample to 14 bucket positions, and per-position
    bucket-cls / bucket-offset predictors laid out [l | r | t | d] in
    outside-in order like `bucketing_bbox_coder.py`."""

    num_classes: int = 80
    feat_channels: int = 256
    fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        b, s, oh, ow, c = roi_feats.shape
        x = roi_feats.reshape(b * s, oh, ow, c)

        # classification branch
        f = x.reshape(b * s, -1)
        f = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             name='cls_fc1')(f))
        f = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             name='cls_fc2')(f))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='cls_out')(f).reshape(b, s, -1)

        # side-aware regression branch
        r = x
        for i in range(2):
            r = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'reg_pre{i}')(r))
        fx = jnp.max(r, axis=1)                       # (BS, 7, C) over y
        fy = jnp.max(r, axis=2)                       # (BS, 7, C) over x
        up_x = nn.ConvTranspose(self.feat_channels, (2,), strides=(2,),
                                dtype=self.dtype, name='up_x')
        up_y = nn.ConvTranspose(self.feat_channels, (2,), strides=(2,),
                                dtype=self.dtype, name='up_y')
        fx = nn.relu(up_x(fx))                        # (BS, 14, C)
        fy = nn.relu(up_y(fy))
        fx = nn.relu(nn.Conv(self.feat_channels, (3,), padding=[(1, 1)],
                             dtype=self.dtype, name='reg_post_x')(fx))
        fy = nn.relu(nn.Conv(self.feat_channels, (3,), padding=[(1, 1)],
                             dtype=self.dtype, name='reg_post_y')(fy))

        def sides(feat, tag):
            # per-position predictors; outside-in layout: near side =
            # positions 0..6 ascending, far side = 13..7 descending
            bcls = nn.Dense(1, dtype=self.dtype,
                            name=f'bucket_cls_{tag}')(feat)[..., 0]
            boff = nn.Dense(1, dtype=self.dtype,
                            name=f'bucket_off_{tag}')(feat)[..., 0]
            near_c, far_c = bcls[:, :SIDE_NUM], bcls[:, :SIDE_NUM - 15:-1]
            near_o, far_o = boff[:, :SIDE_NUM], boff[:, :SIDE_NUM - 15:-1]
            return (near_c, far_c), (near_o, far_o)

        (l_c, r_c), (l_o, r_o) = sides(fx, 'x')
        (t_c, d_c), (t_o, d_o) = sides(fy, 'y')
        bucket_cls = jnp.concatenate([l_c, r_c, t_c, d_c],
                                     -1).reshape(b, s, 4 * SIDE_NUM)
        bucket_off = jnp.concatenate([l_o, r_o, t_o, d_o],
                                     -1).reshape(b, s, 4 * SIDE_NUM)
        return cls, bucket_cls.astype(jnp.float32), \
            bucket_off.astype(jnp.float32)


@DETECTORS.register_module()
class SABLFasterRCNN(nn.Module):
    """Faster R-CNN with the SABL RoI head (reference
    `configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py`): standard FPN RPN,
    bucketing localization instead of delta regression in the RoI stage.
    `cascade=True` runs two bucketing stages with rising IoU thresholds
    (the `sabl_cascade_rcnn_*` rows)."""

    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    scale_factor: float = 1.7
    cascade: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        from ..dense_heads.rpn_head import RPNTrainConfig, ProposalConfig
        from ..detectors.faster_rcnn_fpn import FPNRPNHead
        from ..roi_heads.standard_roi_head import (RoITrainConfig,
                                                   RoITestConfig)
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.rpn_head = FPNRPNHead(dtype=self.dtype)
        n_stages = 2 if self.cascade else 1
        self.bbox_heads = [SABLBBoxHead(num_classes=self.num_classes,
                                        dtype=self.dtype,
                                        name=f'sabl_head_{i}')
                           for i in range(n_stages)]
        self.rpn_train_cfg = RPNTrainConfig()
        self.rpn_proposal_cfg = ProposalConfig(nms_pre=4096,
                                               max_per_img=1000)
        self.rpn_test_cfg = ProposalConfig(nms_pre=4096, max_per_img=1000)
        self.roi_test_cfg = RoITestConfig()

    def _flat_rpn(self, image):
        from ..dense_heads.anchor_head import flatten_level_preds
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_levels, reg_levels = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64],
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes),
                                             axis=0))
        cls = flatten_level_preds(cls_levels, 1)[..., 0]
        reg = flatten_level_preds(reg_levels, 4)
        return feats, cls, reg, anchors

    def _stage_cfg(self, i):
        from ..roi_heads.standard_roi_head import RoITrainConfig
        thr = (0.5, 0.6)[i] if self.cascade else 0.5
        return RoITrainConfig(pos_iou_thr=thr, neg_iou_thr=thr,
                              min_pos_iou=thr,
                              match_low_quality=not self.cascade,
                              use_sigmoid_cls=False)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from ..dense_heads.rpn_head import rpn_loss, rpn_proposals
        from ..losses.cross_entropy_loss import softmax_cross_entropy
        from ..roi_heads.standard_roi_head import (extract_roi_feats_fpn,
                                                   sample_rois)
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

        boxes, box_valid = proposals, prop_valid
        for i, head in enumerate(self.bbox_heads):
            cfg = self._stage_cfg(i)
            sampled = sample_rois(boxes, box_valid, batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_valid'],
                                  self.make_rng('sampler'),
                                  self.num_classes, cfg)
            roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
            cls_s, bc_s, bo_s = head(roi_feats)
            tag = f's{i}.' if self.cascade else ''

            def per_image(cls_i, bc_i, bo_i, smp, gt):
                rois, labels, lvalid, is_pos, _, m = smp
                ce = softmax_cross_entropy(cls_i.astype(jnp.float32),
                                           labels)
                w = lvalid.astype(jnp.float32)
                cls_l = jnp.sum(ce * w)
                gt_m = gt[m]
                offs, offw, blabels, bclsw = bbox2bucket(
                    rois, gt_m, NUM_BUCKETS, self.scale_factor)
                pos_f = is_pos.astype(jnp.float32)[:, None]
                bce = binary_cross_entropy(bc_i, blabels,
                                           reduction='none')
                bcls_l = jnp.sum(bce * bclsw * pos_f)
                boff_l = smooth_l1_loss(bo_i, offs, weight=offw * pos_f,
                                        beta=0.1, reduction='sum')
                return cls_l, bcls_l, boff_l, jnp.sum(w), \
                    jnp.sum(pos_f[:, 0])

            cls_l, bcls_l, boff_l, nval, npos = jax.vmap(per_image)(
                cls_s, bc_s, bo_s, sampled, batch['gt_bboxes'])
            dval = jnp.maximum(jnp.sum(nval), 1.0)
            dpos = jnp.maximum(jnp.sum(npos), 1.0)
            losses[f'{tag}loss_cls'] = jnp.sum(cls_l) / dval
            losses[f'{tag}loss_bbox_cls'] = 0.5 * jnp.sum(bcls_l) / dpos
            losses[f'{tag}loss_bbox_reg'] = jnp.sum(boff_l) / dpos
            if self.cascade and i + 1 < len(self.bbox_heads):
                flat = sampled.rois.reshape(-1, 4)
                dec, _ = bucket2bbox(flat,
                                     jax.lax.stop_gradient(bc_s)
                                     .reshape(flat.shape[0], -1),
                                     jax.lax.stop_gradient(bo_s)
                                     .reshape(flat.shape[0], -1),
                                     NUM_BUCKETS, self.scale_factor)
                boxes = clip_boxes(
                    dec.reshape(sampled.rois.shape),
                    batch['img_shape'][:, None, :].astype(jnp.float32))
                box_valid = sampled.label_valid
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        from ..dense_heads.rpn_head import rpn_proposals
        from ..roi_heads.standard_roi_head import extract_roi_feats_fpn
        feats, cls, reg, anchors = self._flat_rpn(batch['image'])
        b, n = cls.shape
        boxes, _, box_valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.rpn_test_cfg)
        for i, head in enumerate(self.bbox_heads):
            roi_feats = extract_roi_feats_fpn(feats, boxes)
            cls_s, bc_s, bo_s = head(roi_feats)
            if i + 1 < len(self.bbox_heads):
                flat = boxes.reshape(-1, 4)
                dec, _ = bucket2bbox(flat, bc_s.reshape(flat.shape[0], -1),
                                     bo_s.reshape(flat.shape[0], -1),
                                     NUM_BUCKETS, self.scale_factor)
                boxes = clip_boxes(
                    dec.reshape(boxes.shape),
                    batch['img_shape'][:, None, :].astype(jnp.float32))
        cfg = self.roi_test_cfg
        c = self.num_classes

        def per_image(cls_i, bc_i, bo_i, props_i, pvalid_i, shape_i):
            probs = jax.nn.softmax(cls_i.astype(jnp.float32), -1)[:, :c]
            probs = probs * pvalid_i[:, None]
            dec, conf = bucket2bbox(props_i, bc_i, bo_i, NUM_BUCKETS,
                                    self.scale_factor)
            dec = clip_boxes(dec, shape_i.astype(dec.dtype))
            flat = (probs * conf[:, None]).reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            pi = idx // c
            labels = (idx % c).astype(jnp.int32)
            bx = dec[pi]
            keep, _ = batched_nms(bx, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            mm = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, mm)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [bx[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(
            cls_s, bc_s, bo_s, boxes, box_valid, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
