"""RepPoints (reference `mmdet/models/detectors/reppoints_detector.py` +
`mmdet/models/dense_heads/reppoints_head.py`).

Anchor-free representation by 9 adaptive points per location: an init
offset conv proposes the points, a DCN conv conditioned on those offsets
refines them and classifies; boxes come from the points by the 'moment'
transfer (mean ± exp(learned moment)·std).

Assignment follows the reference two-stage recipe: PointAssigner on
centers for the init stage, dense MaxIoU on the init boxes for the refine
stage. Point sets stay (N, 9, 2) tensors; both stages' losses are masked
sums — no per-gt python loops.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.assigners import max_iou_assign
from ...core.bbox.extra_assigners import point_assign
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...ops import batched_deform_conv2d
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import sigmoid_focal_loss, smooth_l1_loss
from ..necks.fpn import FPN

NUM_PTS = 9


def points2bbox_moment(pts: jnp.ndarray, moment: jnp.ndarray,
                       moment_mul: float = 0.01) -> jnp.ndarray:
    """(..., 9, 2) xy points → (..., 4) boxes, 'moment' transfer
    (`reppoints_head.py:points2bbox`)."""
    mean = pts.mean(axis=-2)                                  # (..., 2)
    std = jnp.sqrt(jnp.mean((pts - mean[..., None, :]) ** 2, axis=-2))
    m = moment * moment_mul + jax.lax.stop_gradient(moment) * (1 - moment_mul)
    half = std * jnp.exp(m)
    return jnp.concatenate([mean - half, mean + half], axis=-1)


def points2bbox(pts: jnp.ndarray, moment: jnp.ndarray,
                method: str = 'moment') -> jnp.ndarray:
    """Dispatch over the reference's three point→box transfers
    (`reppoints_head.py:points2bbox` transform_method): 'moment'
    (mean ± exp(moment)·std), 'minmax' (tight bbox of all 9 points),
    'partial_minmax' (bbox of the first 4 points only — the reference's
    reppoints_partial_minmax config)."""
    if method == 'moment':
        return points2bbox_moment(pts, moment)
    sel = pts[..., :4, :] if method == 'partial_minmax' else pts
    lo = sel.min(axis=-2)
    hi = sel.max(axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


@HEADS.register_module()
class RepPointsHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    gradient_mul: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], strides):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                            padding=[(1, 1)] * 2, dtype=self.dtype,
                            name='pts_init_conv')
        init_out = nn.Conv(2 * NUM_PTS, (1, 1), dtype=self.dtype,
                           name='pts_init_out')
        dcn_cls_w = self.param('cls_dconv', nn.initializers.he_normal(),
                               (3, 3, self.feat_channels,
                                self.point_feat_channels))
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='cls_out')
        dcn_ref_w = self.param('pts_refine_dconv',
                               nn.initializers.he_normal(),
                               (3, 3, self.feat_channels,
                                self.point_feat_channels))
        refine_out = nn.Conv(2 * NUM_PTS, (1, 1), dtype=self.dtype,
                             name='pts_refine_out')

        # base 3x3 grid the DCN offsets are relative to, (dy, dx) layout
        base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                    indexing='ij'), -1).reshape(-1, 2)
        base = jnp.asarray(base, jnp.float32).reshape(-1)        # (18,)

        cls_s, init_s, ref_s = [], [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            off_init = init_out(nn.relu(init_conv(r))).astype(jnp.float32)
            # gradient trick (`reppoints_head.py:forward_single`)
            off_grad = self.gradient_mul * off_init + \
                (1 - self.gradient_mul) * jax.lax.stop_gradient(off_init)
            dcn_off = (off_grad - base).astype(self.dtype)
            c_ref = nn.relu(batched_deform_conv2d(c, dcn_off, dcn_cls_w))
            r_ref = nn.relu(batched_deform_conv2d(r, dcn_off, dcn_ref_w))
            off_ref = refine_out(r_ref).astype(jnp.float32) + \
                jax.lax.stop_gradient(off_init)
            cls_s.append(cls_out(c_ref))
            init_s.append(off_init)
            ref_s.append(off_ref)
        return tuple(cls_s), tuple(init_s), tuple(ref_s)


@DETECTORS.register_module()
class RepPoints(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    # 'moment' | 'minmax' | 'partial_minmax' (reference reppoints configs
    # reppoints_{minmax,partial_minmax}_r50_fpn_gn-neck+head_1x_coco.py)
    transform_method: str = 'moment'
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
        self.bbox_head = RepPointsHead(num_classes=self.num_classes,
                                       dtype=self.dtype)
        self.moment = self.param('moment_transfer',
                                 nn.initializers.zeros, (2,))

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, init_lv, ref_lv = self.bbox_head(feats, self.strides)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        pts, strs = [], []
        for (h, w), s in zip(sizes, self.strides):
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
            pts.append(np.stack([xs.ravel() * s, ys.ravel() * s],
                                -1).astype(np.float32))
            strs.append(np.full((h * w,), s, np.float32))
        centers = jnp.asarray(np.concatenate(pts))
        strides_f = jnp.asarray(np.concatenate(strs))
        cls = flatten_level_preds(cls_lv, self.num_classes)
        off_init = flatten_level_preds(init_lv, 2 * NUM_PTS)
        off_ref = flatten_level_preds(ref_lv, 2 * NUM_PTS)

        def to_xy(off):
            # offset layout (dy, dx) pairs scaled by stride, origin center
            o = off.reshape(*off.shape[:-1], NUM_PTS, 2)
            dy, dx = o[..., 0], o[..., 1]
            x = centers[:, 0][:, None] + dx * strides_f[:, None]
            y = centers[:, 1][:, None] + dy * strides_f[:, None]
            return jnp.stack([x, y], axis=-1)                  # (B?, N, 9, 2)

        pts_init = jax.vmap(to_xy)(off_init)
        pts_ref = jax.vmap(to_xy)(off_ref)
        box_init = points2bbox(pts_init, self.moment, self.transform_method)
        box_ref = points2bbox(pts_ref, self.moment, self.transform_method)
        return cls, box_init, box_ref, centers, strides_f

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, box_init, box_ref, centers, strides_f = self._forward_flat(
            batch['image'])

        def per_image(cls_i, bi, br, gt, gtl, gtv):
            # init stage: PointAssigner on (x, y, stride)
            p3 = jnp.concatenate([centers, strides_f[:, None]], axis=-1)
            a_init = point_assign(p3, gt, gtv, gtl)
            pos_i = a_init.assigned_gt_inds > 0
            m_i = jnp.clip(a_init.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            w_i = pos_i.astype(jnp.float32)[:, None]
            l_init = smooth_l1_loss(bi / strides_f[:, None],
                                    gt[m_i] / strides_f[:, None],
                                    beta=1.0 / 9.0,
                                    weight=jnp.broadcast_to(w_i, bi.shape),
                                    reduction='sum')

            # refine stage: MaxIoU on the (detached) init boxes
            a_ref = max_iou_assign(jax.lax.stop_gradient(bi), gt, gtv, gtl,
                                   pos_iou_thr=0.5, neg_iou_thr=0.4,
                                   min_pos_iou=0.0, match_low_quality=True)
            pos_r = a_ref.assigned_gt_inds > 0
            m_r = jnp.clip(a_ref.assigned_gt_inds - 1, 0, gt.shape[0] - 1)
            labels = jnp.where(pos_r, a_ref.labels, self.num_classes)
            cls_l = sigmoid_focal_loss(cls_i, labels, reduction='sum')
            w_r = pos_r.astype(jnp.float32)[:, None]
            l_ref = smooth_l1_loss(br / strides_f[:, None],
                                   gt[m_r] / strides_f[:, None],
                                   beta=1.0 / 9.0,
                                   weight=jnp.broadcast_to(w_r, br.shape),
                                   reduction='sum')
            return (cls_l, l_init, l_ref, jnp.sum(pos_i), jnp.sum(pos_r))

        cls_l, l_init, l_ref, np_i, np_r = jax.vmap(per_image)(
            cls, box_init, box_ref, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        d_i = jnp.maximum(jnp.sum(np_i), 1.0)
        d_r = jnp.maximum(jnp.sum(np_r), 1.0)
        return dict(loss_cls=jnp.sum(cls_l) / d_r,
                    loss_pts_init=0.5 * jnp.sum(l_init) / d_i,
                    loss_pts_refine=jnp.sum(l_ref) / d_r)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, _, box_ref, _, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, br, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = clip_boxes(br[p_idx], shape_i.astype(br.dtype))
            keep, _ = batched_nms(boxes, top, labels, cfg.nms_iou_threshold,
                                  cfg.nms_tile)
            kept = jnp.where(keep, top, NEG_INF)
            m = min(cfg.max_per_img, k)
            sc, sel = jax.lax.top_k(kept, m)
            valid = sc > NEG_INF / 2
            dets = jnp.concatenate(
                [boxes[sel] * valid[:, None],
                 jnp.where(valid, sc, 0.0)[:, None]], -1)
            return dets, jnp.where(valid, labels[sel], 0), valid

        dets, labels, valid = jax.vmap(per_image)(cls, box_ref,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
