"""Region-proposal-centric detector families.

- RPN: standalone proposal network evaluated with AR (reference
  `mmdet/models/detectors/rpn.py`).
- FastRCNN: RoI head over precomputed proposals (reference
  `mmdet/models/detectors/fast_rcnn.py`).
- Guided Anchoring GA-RetinaNet / GA-RPN (reference
  `mmdet/models/dense_heads/guided_anchor_head.py`, `ga_retina_head.py`,
  `ga_rpn_head.py`): sparse anchoring via predicted location probability +
  anchor shape, deformable feature adaptation.
- CascadeRPN (reference `mmdet/models/dense_heads/cascade_rpn_head.py`):
  two-stage anchor refinement with adaptive (offset-fed deformable) convs.

TPU-first notes: all level lists flatten to one static (N,·) tensor with a
per-location level id; guided anchors are traced tensors (centers from the
grid, shapes from the net) so MaxIoU assignment on them stays inside jit;
losses are masked sums, never gathered to dynamic shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.extra_assigners import center_region_assign
from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...core.post.nms import NEG_INF, nms
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       dense_anchor_predict,
                                       flatten_level_preds)
from ..dense_heads.rpn_head import (ProposalConfig, RPNTrainConfig, rpn_loss,
                                    rpn_proposals)
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..losses.cross_entropy_loss import binary_cross_entropy
from ..losses.iou_loss import iou_loss
from ..necks.fpn import FPN
from ..roi_heads.bbox_head import Shared2FCBBoxHead
from ..roi_heads.standard_roi_head import (RoITestConfig, RoITrainConfig,
                                           bbox_loss, extract_roi_feats_fpn,
                                           roi_head_predict, sample_rois)
from .faster_rcnn_fpn import FPNRPNHead
from ...ops import batched_deform_conv2d


def _fpn_grid(strides, sizes):
    """Flat per-location centers, strides and level ids for an FPN."""
    centers, svec, lvec = [], [], []
    for li, (s, (h, w)) in enumerate(zip(strides, sizes)):
        ys = (np.arange(h) + 0.5) * s
        xs = (np.arange(w) + 0.5) * s
        yy, xx = np.meshgrid(ys, xs, indexing='ij')
        centers.append(np.stack([xx.ravel(), yy.ravel()], -1))
        svec.append(np.full(h * w, s, np.float32))
        lvec.append(np.full(h * w, li, np.int32))
    return (jnp.asarray(np.concatenate(centers), jnp.float32),
            jnp.asarray(np.concatenate(svec)),
            jnp.asarray(np.concatenate(lvec)))


@DETECTORS.register_module()
class RPN(nn.Module):
    """Standalone RPN (reference `rpn.py:13`): proposals are the detections
    (single 'object' class), for AR-style proposal evaluation."""

    num_classes: int = 1        # ignored; proposals are class-agnostic
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    # c4=True → the reference's `rpn_r50_caffe_c4_1x` spelling: single
    # stride-16 C4 level (3-stage trunk) with the dense 15-anchor grid
    # instead of FPN levels (reference configs/rpn/rpn_r50_caffe_c4_1x_coco.py)
    c4: bool = False
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_train_cfg: RPNTrainConfig = RPNTrainConfig()
    test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096, max_per_img=1000)
    dtype: Any = jnp.float32

    def setup(self):
        if self.c4:
            from ..dense_heads.rpn_head import RPNHead
            self.backbone = build_trunk(
                self.backbone_cfg, depth=self.backbone_depth, num_stages=3,
                strides=(1, 2, 2), dilations=(1, 1, 1), out_indices=(2,),
                frozen_stages=self.frozen_stages, dtype=self.dtype)
            self.rpn_head = RPNHead(feat_channels=1024, num_anchors=15,
                                    dtype=self.dtype)
            return
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.rpn_head = FPNRPNHead(dtype=self.dtype)

    def _flat(self, image):
        if self.c4:
            from .faster_rcnn import AnchorConfig
            (feat,) = self.backbone(image.astype(self.dtype))
            cls4, reg4 = self.rpn_head(feat)       # (B, H, W, A[·4])
            b = cls4.shape[0]
            anchors = jnp.asarray(AnchorConfig().grid_anchors(
                feat.shape[-3], feat.shape[-2]))
            return (cls4.reshape(b, -1), reg4.reshape(b, -1, 4), anchors)
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_lv = self.rpn_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.rpn_strides),
                              ratios=[0.5, 1.0, 2.0], scales=[8])
        anchors = jnp.asarray(np.concatenate(gen.grid_priors(sizes), 0))
        cls = flatten_level_preds(cls_lv, 1)[..., 0]
        reg = flatten_level_preds(reg_lv, 4)
        return cls, reg, anchors

    def loss(self, batch):
        cls, reg, anchors = self._flat(batch['image'])
        b, n = cls.shape
        return rpn_loss(cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4),
                        anchors, batch['gt_bboxes'], batch['gt_valid'],
                        batch['img_shape'], self.make_rng('sampler'),
                        self.rpn_train_cfg)

    def predict(self, batch):
        cls, reg, anchors = self._flat(batch['image'])
        b, n = cls.shape
        boxes, scores, valid = rpn_proposals(
            cls.reshape(b, n, 1, 1), reg.reshape(b, n, 1, 4), anchors,
            batch['img_shape'], self.test_cfg)
        dets = jnp.concatenate([boxes, scores[..., None]], -1)
        return dict(dets=dets, labels=jnp.zeros(scores.shape, jnp.int32),
                    valid=valid)

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@DETECTORS.register_module()
class FastRCNN(nn.Module):
    """Fast R-CNN (reference `fast_rcnn.py:8`): RoI head only; proposals
    come precomputed in `batch['proposals']` (B, P, 4) with
    `batch['proposals_valid']` (B, P) — e.g. from a standalone RPN run."""

    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    neck_type: str = 'FPN'    # 'BFP' -> configs/libra_rcnn libra_fast row
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()
    dtype: Any = jnp.float32

    def setup(self):
        from ..necks.build import make_fpn_neck
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = make_fpn_neck(
            self.neck_type, in_channels=self.backbone.stage_channels(),
            out_channels=256, num_outs=5, dtype=self.dtype)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256, dtype=self.dtype)

    def loss(self, batch):
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        sampled = sample_rois(batch['proposals'], batch['proposals_valid'],
                              batch['gt_bboxes'], batch['gt_labels'],
                              batch['gt_valid'], self.make_rng('sampler'),
                              self.num_classes, self.roi_train_cfg)
        roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        return bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                         self.roi_train_cfg)

    def predict(self, batch):
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        return roi_head_predict(
            self.bbox_head, feats, batch['proposals'],
            batch['proposals_valid'], batch['img_shape'], self.num_classes,
            featmap_stride=0, reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=lambda f, r: extract_roi_feats_fpn(f, r))

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@HEADS.register_module()
class GuidedAnchorHead(nn.Module):
    """Shared GA machinery (reference `guided_anchor_head.py:116`): per
    level predicts location prob (1ch), anchor shape (2ch, dw/dh), adapts
    the feature with a shape-conditioned deformable conv, then runs cls
    (`out_channels`) and reg (4) on the adapted feature."""

    out_channels: int = 1            # 1 for GA-RPN; classes for GA-Retina
    feat_channels: int = 256
    stacked_convs: int = 0           # 4 for GA-Retina, 0 for GA-RPN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        pre = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name=f'pre_conv{i}')
               for i in range(self.stacked_convs)]
        loc_conv = nn.Conv(1, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name='conv_loc')
        shape_conv = nn.Conv(2, (1, 1), dtype=self.dtype, name='conv_shape')
        # offset net + deformable adaptation (feature_adaption in reference)
        offset_conv = nn.Conv(2 * 9, (1, 1), use_bias=False,
                              kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name='conv_offset')
        adapt_w = self.param(
            'adapt_conv_w', nn.initializers.he_normal(),
            (3, 3, self.feat_channels, self.feat_channels),
            self.dtype)
        cls_conv = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           bias_init=nn.initializers.constant(-4.595),
                           name='conv_cls')
        reg_conv = nn.Conv(4, (1, 1), dtype=self.dtype, name='conv_reg')

        loc_s, shape_s, cls_s, reg_s = [], [], [], []
        for f in feats:
            t = f
            for conv in pre:
                t = nn.relu(conv(t))
            loc_s.append(loc_conv(t).astype(jnp.float32))
            sh = shape_conv(t).astype(jnp.float32)
            shape_s.append(sh)
            off = offset_conv(jax.lax.stop_gradient(sh).astype(self.dtype))
            a = nn.relu(batched_deform_conv2d(t, off, adapt_w))
            cls_s.append(cls_conv(a).astype(jnp.float32))
            reg_s.append(reg_conv(a).astype(jnp.float32))
        return (tuple(loc_s), tuple(shape_s), tuple(cls_s), tuple(reg_s))


class _GABase(nn.Module):
    """Common GA forward/loss over the FPN, parameterized by out channels."""

    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base: float = 8.0         # anchor base = stride * octave_base
    loc_filter_thr: float = 0.01
    center_ratio: float = 0.2
    dtype: Any = jnp.float32

    def ga_out_channels(self):
        raise NotImplementedError

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        start = 1 if self.strides[0] == 8 else 0
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=start,
                        add_extra_convs='on_input' if start else None,
                        dtype=self.dtype)
        self.ga_head = GuidedAnchorHead(
            out_channels=self.ga_out_channels(),
            stacked_convs=4 if self.ga_out_channels() > 1 else 0,
            dtype=self.dtype)

    def _flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        loc_lv, shape_lv, cls_lv, reg_lv = self.ga_head(feats)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        centers, strides, levels = _fpn_grid(self.strides, sizes)
        loc = flatten_level_preds(loc_lv, 1)[..., 0]
        shape = flatten_level_preds(shape_lv, 2)
        cls = flatten_level_preds(cls_lv, self.ga_out_channels())
        reg = flatten_level_preds(reg_lv, 4)
        # guided anchors: centers on the grid, wh = base * exp(pred)
        base = (strides * self.octave_base)[None, :, None]
        wh = base * jnp.exp(jnp.clip(shape, -4.0, 4.0))
        anchors = jnp.concatenate([centers[None] - wh / 2,
                                   centers[None] + wh / 2], -1)
        return loc, shape, cls, reg, anchors, centers, strides, levels

    def _ga_losses(self, loc, anchors, centers, strides, levels, batch):
        """Location focal loss + shape IoU loss (reference
        `guided_anchor_head.py:ga_loc_targets`/`ga_shape_targets`)."""

        def per_image(loc_i, anch_i, gt, gtv):
            # level of each gt from its scale (reference maps sqrt(area)
            # to the octave grid)
            gw = gt[:, 2] - gt[:, 0]
            gh = gt[:, 3] - gt[:, 1]
            scale = jnp.sqrt(jnp.maximum(gw * gh, 1e-6))
            gl = jnp.clip(jnp.round(
                jnp.log2(scale / (self.strides[0] * self.octave_base))),
                0, len(self.strides) - 1)
            # center-region positives, restricted to the gt's level
            ctr = (gt[:, :2] + gt[:, 2:]) / 2
            half = jnp.stack([gw, gh], -1) / 2 * self.center_ratio
            lo, hi = ctr - half, ctr + half
            inside = ((centers[:, 0][None] >= lo[:, 0:1])
                      & (centers[:, 0][None] <= hi[:, 0:1])
                      & (centers[:, 1][None] >= lo[:, 1:2])
                      & (centers[:, 1][None] <= hi[:, 1:2]))
            lvl_ok = levels[None, :] == gl[:, None]
            pos_mat = inside & lvl_ok & gtv[:, None]            # (G, N)
            is_pos = jnp.any(pos_mat, 0)
            loc_l = sigmoid_focal_loss(
                loc_i[:, None], jnp.where(is_pos, 0, 1), reduction='sum')
            # shape loss: IoU between guided anchor and its (area-min) gt
            area = jnp.where(gtv, gw * gh, jnp.inf)
            key = jnp.where(pos_mat, area[:, None], jnp.inf)
            best = jnp.argmin(key, 0)
            tgt = gt[best]
            sl = iou_loss(anch_i, tgt,
                          weight=is_pos.astype(jnp.float32),
                          reduction='sum')
            return loc_l, sl, jnp.sum(is_pos)

        loc_l, shape_l, npos = jax.vmap(per_image)(
            loc, anchors, batch['gt_bboxes'], batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_loc=jnp.sum(loc_l) / denom,
                    loss_shape=jnp.sum(shape_l) / denom)


@DETECTORS.register_module()
class GARetinaNet(_GABase):
    """GA-RetinaNet (reference `ga_retina_head.py:11` +
    `configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py`)."""

    test_cfg: DensePredictConfig = DensePredictConfig()

    def ga_out_channels(self):
        return self.num_classes

    def loss(self, batch):
        loc, shape, cls, reg, anchors, centers, strides, levels = \
            self._flat(batch['image'])
        losses = self._ga_losses(loc, anchors, centers, strides, levels,
                                 batch)
        sg_anchors = jax.lax.stop_gradient(anchors)

        def per_image(cls_i, reg_i, anch_i, gt, gtl, gtv):
            a = max_iou_assign(anch_i, gt, gtv, gtl, pos_iou_thr=0.5,
                               neg_iou_thr=0.4, min_pos_iou=0.0)
            pos = a.assigned_gt_inds > 0
            labels = jnp.where(pos, a.labels, self.num_classes)
            cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            tgt = bbox2delta(anch_i, gt[m], stds=(0.07, 0.07, 0.14, 0.14))
            reg_l = smooth_l1_loss(reg_i, tgt,
                                   weight=pos[:, None].astype(jnp.float32),
                                   beta=1.0 / 9.0, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos)

        cls_l, reg_l, npos = jax.vmap(per_image)(
            cls, reg, sg_anchors, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        losses.update(loss_cls=jnp.sum(cls_l) / denom,
                      loss_bbox=jnp.sum(reg_l) / denom)
        return losses

    def predict(self, batch):
        loc, shape, cls, reg, anchors, *_ = self._flat(batch['image'])
        # mask out low-location-probability anchors
        # (`get_anchors` loc_mask in the reference)
        keep = jax.nn.sigmoid(loc) >= self.loc_filter_thr
        cls = jnp.where(keep[..., None], cls, NEG_INF)
        cfg = self.test_cfg._replace(target_stds=(0.07, 0.07, 0.14, 0.14))

        def per_image(cls_i, reg_i, anch_i, shape_i):
            return dense_anchor_predict(cls_i[None], reg_i[None], anch_i,
                                        shape_i[None], self.num_classes, cfg)
        out = jax.vmap(
            lambda c, r, a, s: jax.tree_util.tree_map(
                lambda x: x[0], per_image(c, r, a, s)))(
            cls, reg, anchors, batch['img_shape'])
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@DETECTORS.register_module()
class GARPN(_GABase):
    """GA-RPN (reference `ga_rpn_head.py:12`): class-agnostic guided
    anchoring; emits proposals as class-0 detections like `RPN`."""

    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096, max_per_img=1000)

    def ga_out_channels(self):
        return 1

    def loss(self, batch):
        loc, shape, cls, reg, anchors, centers, strides, levels = \
            self._flat(batch['image'])
        losses = self._ga_losses(loc, anchors, centers, strides, levels,
                                 batch)
        sg_anchors = jax.lax.stop_gradient(anchors)

        def per_image(cls_i, reg_i, anch_i, gt, gtv):
            a = max_iou_assign(anch_i, gt, gtv, None, pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3)
            pos = a.assigned_gt_inds > 0
            neg = a.assigned_gt_inds == 0
            chosen = pos | neg
            cls_l = binary_cross_entropy(
                cls_i[..., 0], pos.astype(jnp.float32),
                weight=chosen.astype(jnp.float32), reduction='sum')
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            tgt = bbox2delta(anch_i, gt[m], stds=(0.07, 0.07, 0.14, 0.14))
            reg_l = smooth_l1_loss(reg_i, tgt,
                                   weight=pos[:, None].astype(jnp.float32),
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos), jnp.sum(chosen)

        cls_l, reg_l, npos, cnt = jax.vmap(per_image)(
            cls, reg, sg_anchors, batch['gt_bboxes'], batch['gt_valid'])
        losses.update(loss_rpn_cls=jnp.sum(cls_l)
                      / jnp.maximum(jnp.sum(cnt), 1.0),
                      loss_rpn_bbox=jnp.sum(reg_l)
                      / jnp.maximum(jnp.sum(npos), 1.0))
        return losses

    def predict(self, batch):
        loc, shape, cls, reg, anchors, *_ = self._flat(batch['image'])
        keep = jax.nn.sigmoid(loc) >= self.loc_filter_thr
        score = jnp.where(keep, cls[..., 0], NEG_INF)
        cfg = self.test_cfg

        def per_image(score_i, reg_i, anch_i, shape_i):
            k = min(cfg.nms_pre, score_i.shape[0])
            top, idx = jax.lax.top_k(score_i, k)
            boxes = delta2bbox(anch_i[idx], reg_i[idx],
                               stds=jnp.asarray((0.07, 0.07, 0.14, 0.14)))
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            kp, _ = nms(boxes, top, cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(kp, top, NEG_INF)
            p = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, p)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, jax.nn.sigmoid(sc), 0.0)[:, None]], -1)
            return dets, jnp.zeros((p,), jnp.int32), valid

        dets, labels, valid = jax.vmap(per_image)(
            score, reg, anchors, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@DETECTORS.register_module()
class CascadeRPN(nn.Module):
    """Cascade RPN (reference `cascade_rpn_head.py:537`): stage 1 regresses
    a single per-cell anchor (region-assigned, no cls), its refined boxes
    feed an offset-fed adaptive conv; stage 2 classifies + regresses the
    refined anchors. Emits proposals as class-0 detections."""

    num_classes: int = 1
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: float = 8.0
    test_cfg: ProposalConfig = ProposalConfig(nms_pre=4096, max_per_img=1000)
    dtype: Any = jnp.float32

    def setup(self):
        # setup-style (not compact) so two-stage subclasses can extend the
        # module set (CRPNFasterRCNN adds the RoI head)
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth,
            strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
            out_indices=(0, 1, 2, 3), frozen_stages=self.frozen_stages,
            dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, dtype=self.dtype)
        self.s1_conv = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                               dtype=self.dtype)
        self.s1_reg = nn.Conv(4, (1, 1), dtype=self.dtype)
        # attribute named s2_offset so the param tree keeps the old
        # compact-era naming
        self.s2_offset = nn.Conv(2 * 9, (1, 1), use_bias=False,
                                 kernel_init=nn.initializers.zeros,
                                 dtype=self.dtype)
        self.s2_adapt_w = self.param('s2_adapt_w',
                                     nn.initializers.he_normal(),
                                     (3, 3, 256, 256), self.dtype)
        self.s2_cls = nn.Conv(1, (1, 1), dtype=self.dtype)
        self.s2_reg = nn.Conv(4, (1, 1), dtype=self.dtype)

    def _stages(self, image):
        """Backbone→FPN→both RPN stages; returns flat preds + anchors."""
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        s1_conv, s1_reg = self.s1_conv, self.s1_reg
        off_proj, s2_adapt_w = self.s2_offset, self.s2_adapt_w
        s2_cls, s2_reg = self.s2_cls, self.s2_reg

        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        centers, strides_v, levels = _fpn_grid(self.strides, sizes)
        base = strides_v * self.anchor_scale
        anchors0 = jnp.concatenate(
            [centers - base[:, None] / 2, centers + base[:, None] / 2], -1)

        reg1_lv, cls2_lv, reg2_lv = [], [], []
        for f in feats:
            t1 = nn.relu(s1_conv(f))
            r1 = s1_reg(t1).astype(jnp.float32)
            reg1_lv.append(r1)
            off = off_proj(jax.lax.stop_gradient(r1).astype(self.dtype))
            t2 = nn.relu(batched_deform_conv2d(t1, off, s2_adapt_w))
            cls2_lv.append(s2_cls(t2).astype(jnp.float32))
            reg2_lv.append(s2_reg(t2).astype(jnp.float32))
        reg1 = flatten_level_preds(reg1_lv, 4)
        cls2 = flatten_level_preds(cls2_lv, 1)[..., 0]
        reg2 = flatten_level_preds(reg2_lv, 4)
        # refined anchors from stage 1 (per image)
        anchors1 = jax.vmap(lambda r: delta2bbox(anchors0, r))(reg1)
        return reg1, cls2, reg2, anchors0, anchors1, centers, feats

    def loss(self, batch):
        reg1, cls2, reg2, anchors0, anchors1, centers, _ = self._stages(
            batch['image'])

        def per_image(reg1_i, cls2_i, reg2_i, anch1_i, gt, gtv):
            # stage 1: center-region assignment on the static anchors
            a1 = center_region_assign(anchors0, gt, gtv, None,
                                      pos_scale=0.2, neg_scale=0.2)
            pos1 = a1.assigned_gt_inds > 0
            m1 = jnp.clip(a1.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            t1 = bbox2delta(anchors0, gt[m1])
            l1 = smooth_l1_loss(reg1_i, t1,
                                weight=pos1[:, None].astype(jnp.float32),
                                beta=1.0, reduction='sum')
            # stage 2: MaxIoU on refined anchors
            anch = jax.lax.stop_gradient(anch1_i)
            a2 = max_iou_assign(anch, gt, gtv, None, pos_iou_thr=0.7,
                                neg_iou_thr=0.7, min_pos_iou=0.3)
            pos2 = a2.assigned_gt_inds > 0
            neg2 = a2.assigned_gt_inds == 0
            chosen = pos2 | neg2
            cls_l = binary_cross_entropy(
                cls2_i, pos2.astype(jnp.float32),
                weight=chosen.astype(jnp.float32), reduction='sum')
            m2 = jnp.clip(a2.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            t2 = bbox2delta(anch, gt[m2])
            l2 = smooth_l1_loss(reg2_i, t2,
                                weight=pos2[:, None].astype(jnp.float32),
                                beta=1.0, reduction='sum')
            return (l1, cls_l, l2, jnp.sum(pos1) + jnp.sum(pos2),
                    jnp.sum(chosen))

        l1, cls_l, l2, npos, nchosen = jax.vmap(per_image)(
            reg1, cls2, reg2, anchors1, batch['gt_bboxes'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_rpn_reg_s1=jnp.sum(l1) / denom,
                    loss_rpn_cls=jnp.sum(cls_l)
                    / jnp.maximum(jnp.sum(nchosen), 1.0),
                    loss_rpn_reg_s2=jnp.sum(l2) / denom)

    def predict(self, batch):
        reg1, cls2, reg2, anchors0, anchors1, centers, _ = self._stages(
            batch['image'])
        cfg = self.test_cfg

        def per_image(cls_i, reg_i, anch_i, shape_i):
            k = min(cfg.nms_pre, cls_i.shape[0])
            top, idx = jax.lax.top_k(cls_i, k)
            boxes = delta2bbox(anch_i[idx], reg_i[idx])
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            kp, _ = nms(boxes, top, cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(kp, top, NEG_INF)
            p = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, p)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, jax.nn.sigmoid(sc), 0.0)[:, None]], -1)
            return dets, jnp.zeros((p,), jnp.int32), valid

        dets, labels, valid = jax.vmap(per_image)(
            cls2, reg2, anchors1, batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


@DETECTORS.register_module()
class GAFasterRCNN(GARPN):
    """GA-Faster R-CNN (reference `configs/guided_anchoring/
    ga_faster_*.py`: GA-RPN proposals + the standard Shared2FC RoI head;
    the reference's `rpn_head=GARPNHead` two-stage assembly)."""

    num_classes: int = 80
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(nms_pre=2048,
                                                      max_per_img=300)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(use_sigmoid_cls=False)
    roi_test_cfg: RoITestConfig = RoITestConfig()

    def setup(self):
        super().setup()
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, in_channels=256, dtype=self.dtype)

    _GA_STDS = (0.07, 0.07, 0.14, 0.14)

    def _ga_proposals(self, loc, cls, reg, anchors, img_shape,
                      cfg: ProposalConfig):
        """GARPN.predict's per-image path, returning (B, P, 4) + valid."""
        keep = jax.nn.sigmoid(loc) >= self.loc_filter_thr
        score = jnp.where(keep, cls[..., 0], NEG_INF)

        def per_image(score_i, reg_i, anch_i, shape_i):
            k = min(cfg.nms_pre, score_i.shape[0])
            top, idx = jax.lax.top_k(score_i, k)
            boxes = delta2bbox(anch_i[idx], reg_i[idx],
                               stds=jnp.asarray(self._GA_STDS))
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            kp, _ = nms(boxes, top, cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(kp, top, NEG_INF)
            p = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, p)
            valid = sc > NEG_INF / 2
            return boxes[sel] * valid[:, None], valid

        return jax.vmap(per_image)(score, reg, anchors, img_shape)

    def loss(self, batch):
        loc, shape, cls, reg, anchors, centers, strides, levels = \
            self._flat(batch['image'])
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        losses = self._ga_losses(loc, anchors, centers, strides, levels,
                                 batch)
        sg_anchors = jax.lax.stop_gradient(anchors)

        def per_image(cls_i, reg_i, anch_i, gt, gtv):
            a = max_iou_assign(anch_i, gt, gtv, None, pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3)
            pos = a.assigned_gt_inds > 0
            neg = a.assigned_gt_inds == 0
            chosen = pos | neg
            cls_l = binary_cross_entropy(
                cls_i[..., 0], pos.astype(jnp.float32),
                weight=chosen.astype(jnp.float32), reduction='sum')
            m = jnp.clip(a.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            tgt = bbox2delta(anch_i, gt[m], stds=self._GA_STDS)
            reg_l = smooth_l1_loss(reg_i, tgt,
                                   weight=pos[:, None].astype(jnp.float32),
                                   beta=1.0, reduction='sum')
            return cls_l, reg_l, jnp.sum(pos), jnp.sum(chosen)

        cls_l, reg_l, npos, cnt = jax.vmap(per_image)(
            cls, reg, sg_anchors, batch['gt_bboxes'], batch['gt_valid'])
        losses.update(loss_rpn_cls=jnp.sum(cls_l)
                      / jnp.maximum(jnp.sum(cnt), 1.0),
                      loss_rpn_bbox=jnp.sum(reg_l)
                      / jnp.maximum(jnp.sum(npos), 1.0))

        proposals, prop_valid = self._ga_proposals(
            jax.lax.stop_gradient(loc), jax.lax.stop_gradient(cls),
            jax.lax.stop_gradient(reg), sg_anchors, batch['img_shape'],
            self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
        cls_s, reg_s, _ = self.bbox_head(roi_feats)
        losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                self.roi_train_cfg))
        return losses

    def predict(self, batch):
        loc, shape, cls, reg, anchors, *_ = self._flat(batch['image'])
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        proposals, prop_valid = self._ga_proposals(
            loc, cls, reg, anchors, batch['img_shape'], self.test_cfg)
        return roi_head_predict(
            self.bbox_head, feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=extract_roi_feats_fpn)


@DETECTORS.register_module()
class CRPNFasterRCNN(CascadeRPN):
    """CRPN-inside-Faster-R-CNN (reference
    `configs/cascade_rpn/crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py`): the
    two-stage CascadeRPN replaces the plain RPN of Faster R-CNN — its
    losses are weighted by `rpn_weight=0.7`, its refined stage-2 proposals
    (NMS iou 0.8, max 300) feed a Shared2FC RoI head trained at
    pos/neg/min IoU 0.65 with target_stds (0.04, 0.04, 0.08, 0.08)."""

    num_classes: int = 80
    rpn_weight: float = 0.7
    rpn_proposal_cfg: ProposalConfig = ProposalConfig(
        nms_pre=2048, max_per_img=300, nms_iou_threshold=0.8)
    test_cfg: ProposalConfig = ProposalConfig(
        nms_pre=2048, max_per_img=300, nms_iou_threshold=0.8)
    roi_train_cfg: RoITrainConfig = RoITrainConfig(
        pos_iou_thr=0.65, neg_iou_thr=0.65, min_pos_iou=0.65,
        num_samples=256, use_sigmoid_cls=False,
        target_stds=(0.04, 0.04, 0.08, 0.08))
    roi_test_cfg: RoITestConfig = RoITestConfig(score_thr=1e-3)

    def setup(self):
        super().setup()
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes,
                                           in_channels=256,
                                           dtype=self.dtype)

    def _bbox_head(self):
        return self.bbox_head

    def _crpn_proposals(self, cls2, reg2, anchors1, img_shape,
                        cfg: ProposalConfig):
        """Stage-2 refined boxes → NMS → (B, P, 4) proposals + valid."""
        def per_image(cls_i, reg_i, anch_i, shape_i):
            k = min(cfg.nms_pre, cls_i.shape[0])
            top, idx = jax.lax.top_k(cls_i, k)
            boxes = delta2bbox(anch_i[idx], reg_i[idx])
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
            kp, _ = nms(boxes, top, cfg.nms_iou_threshold, cfg.nms_tile)
            kept = jnp.where(kp, top, NEG_INF)
            p = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, p)
            valid = sc > NEG_INF / 2
            return boxes[sel] * valid[:, None], valid

        return jax.vmap(per_image)(cls2, reg2, anchors1, img_shape)

    def loss(self, batch):
        reg1, cls2, reg2, anchors0, anchors1, centers, feats = self._stages(
            batch['image'])

        def per_image(reg1_i, cls2_i, reg2_i, anch1_i, gt, gtv):
            a1 = center_region_assign(anchors0, gt, gtv, None,
                                      pos_scale=0.2, neg_scale=0.2)
            pos1 = a1.assigned_gt_inds > 0
            m1 = jnp.clip(a1.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            t1 = bbox2delta(anchors0, gt[m1])
            l1 = smooth_l1_loss(reg1_i, t1,
                                weight=pos1[:, None].astype(jnp.float32),
                                beta=1.0, reduction='sum')
            anch = jax.lax.stop_gradient(anch1_i)
            a2 = max_iou_assign(anch, gt, gtv, None, pos_iou_thr=0.7,
                                neg_iou_thr=0.7, min_pos_iou=0.3)
            pos2 = a2.assigned_gt_inds > 0
            neg2 = a2.assigned_gt_inds == 0
            chosen = pos2 | neg2
            cls_l = binary_cross_entropy(
                cls2_i, pos2.astype(jnp.float32),
                weight=chosen.astype(jnp.float32), reduction='sum')
            m2 = jnp.clip(a2.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            t2 = bbox2delta(anch, gt[m2])
            l2 = smooth_l1_loss(reg2_i, t2,
                                weight=pos2[:, None].astype(jnp.float32),
                                beta=1.0, reduction='sum')
            return (l1, cls_l, l2, jnp.sum(pos1) + jnp.sum(pos2),
                    jnp.sum(chosen))

        l1, cls_l, l2, npos, nchosen = jax.vmap(per_image)(
            reg1, cls2, reg2, anchors1, batch['gt_bboxes'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        w = self.rpn_weight
        losses = dict(
            loss_rpn_reg_s1=w * jnp.sum(l1) / denom,
            loss_rpn_cls=w * jnp.sum(cls_l)
            / jnp.maximum(jnp.sum(nchosen), 1.0),
            loss_rpn_reg_s2=w * jnp.sum(l2) / denom)

        proposals, prop_valid = self._crpn_proposals(
            jax.lax.stop_gradient(cls2), jax.lax.stop_gradient(reg2),
            jax.lax.stop_gradient(anchors1), batch['img_shape'],
            self.rpn_proposal_cfg)
        sampled = sample_rois(proposals, prop_valid, batch['gt_bboxes'],
                              batch['gt_labels'], batch['gt_valid'],
                              self.make_rng('sampler'), self.num_classes,
                              self.roi_train_cfg)
        roi_feats = extract_roi_feats_fpn(feats, sampled.rois)
        cls_s, reg_s, _ = self._bbox_head()(roi_feats)
        losses.update(bbox_loss(cls_s, reg_s, sampled, self.num_classes,
                                self.roi_train_cfg))
        return losses

    def predict(self, batch):
        reg1, cls2, reg2, anchors0, anchors1, centers, feats = self._stages(
            batch['image'])
        proposals, prop_valid = self._crpn_proposals(
            cls2, reg2, anchors1, batch['img_shape'], self.test_cfg)
        return roi_head_predict(
            self._bbox_head(), feats, proposals, prop_valid,
            batch['img_shape'], self.num_classes, featmap_stride=0,
            reg_class_agnostic=False,
            target_stds=self.roi_train_cfg.target_stds,
            use_sigmoid_cls=self.roi_train_cfg.use_sigmoid_cls,
            cfg=self.roi_test_cfg,
            roi_extractor=extract_roi_feats_fpn)
