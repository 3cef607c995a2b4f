"""VFNet / VarifocalNet (reference `mmdet/models/detectors/vfnet.py` +
`mmdet/models/dense_heads/vfnet_head.py`).

FCOS-shaped head with: (1) an initial distance regression, (2) a
star-shaped deformable refinement — the 9 DCN taps sample at the corners /
edge-midpoints / center of the *initially predicted* box, and (3) IoU-aware
varifocal classification whose positive targets are the refined boxes' IoU
with their gt.

TPU shape: the star offsets come straight from the initial distance map
(pure arithmetic, no extra convs), the two DCN layers run through
`batched_deform_conv2d` (4-gather + MXU einsum), and assignment is the
shared dense ATSS.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors.anchor_generator import AnchorGenerator
from ...core.bbox.atss_assigner import atss_assign
from ...core.bbox.coders import distance2bbox
from ...core.bbox.iou import bbox_overlaps
from ...core.bbox.transforms import clip_boxes
from ...core.post.nms import NEG_INF, batched_nms
from ...ops import batched_deform_conv2d
from ...utils.registry import DETECTORS, HEADS
from ..backbones.build import build_trunk
from ..dense_heads.anchor_head import (DensePredictConfig,
                                       flatten_level_preds)
from ..losses import giou_loss, varifocal_loss
from ..necks.fpn import FPN


def _star_offsets(dist: jnp.ndarray, stride: float) -> jnp.ndarray:
    """(B, H, W, 4) l,t,r,b distances (in px) → (B, H, W, 18) DCN offsets
    sampling the 9 star points of the predicted box, relative to the 3x3
    kernel grid (vfnet_head.py star_dcn_offset). Offset layout (dy, dx)."""
    l, t, r, b = [dist[..., i] / stride for i in range(4)]
    zero = jnp.zeros_like(l)
    # kernel taps row-major: (-1,-1)..(1,1); offset = target - base
    dys = [-t, -t, -t, zero, zero, zero, b, b, b]
    dxs = [-l, zero, r, -l, zero, r, -l, zero, r]
    base_y = [-1, -1, -1, 0, 0, 0, 1, 1, 1]
    base_x = [-1, 0, 1, -1, 0, 1, -1, 0, 1]
    offs = []
    for dy, dx, by, bx in zip(dys, dxs, base_y, base_x):
        offs.append(dy - by)
        offs.append(dx - bx)
    return jnp.stack(offs, axis=-1)


@HEADS.register_module()
class VFNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], strides):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_init_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                               dtype=self.dtype, name='vfnet_reg')
        dcn_reg_w = self.param('reg_refine_dconv',
                               nn.initializers.he_normal(),
                               (3, 3, self.feat_channels,
                                self.feat_channels))
        dcn_cls_w = self.param('cls_dconv', nn.initializers.he_normal(),
                               (3, 3, self.feat_channels,
                                self.feat_channels))
        reg_refine_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                                 name='vfnet_reg_refine')
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name='vfnet_cls')

        cls_s, reg_i_s, reg_r_s = [], [], []
        for lvl, f in enumerate(feats):
            c, r = f, f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            s_init = self.param(f'scale_{lvl}', nn.initializers.ones, ())
            s_ref = self.param(f'scale_refine_{lvl}',
                               nn.initializers.ones, ())
            d_init = jnp.exp(reg_init_out(r).astype(jnp.float32) *
                             s_init.astype(jnp.float32)) * strides[lvl]
            offs = _star_offsets(jax.lax.stop_gradient(d_init), strides[lvl])
            offs = offs.astype(self.dtype)
            r_ref = nn.relu(batched_deform_conv2d(r, offs, dcn_reg_w))
            d_ref = jnp.exp(reg_refine_out(r_ref).astype(jnp.float32) *
                            s_ref.astype(jnp.float32)) * \
                jax.lax.stop_gradient(d_init)
            c_ref = nn.relu(batched_deform_conv2d(c, offs, dcn_cls_w))
            cls_s.append(cls_out(c_ref))
            reg_i_s.append(d_init)
            reg_r_s.append(d_ref)
        return tuple(cls_s), tuple(reg_i_s), tuple(reg_r_s)


@DETECTORS.register_module()
class VFNet(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    topk: int = 9
    test_cfg: DensePredictConfig = DensePredictConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs='on_output',
                        relu_before_extra_convs=True, dtype=self.dtype)
        self.bbox_head = VFNetHead(num_classes=self.num_classes,
                                   dtype=self.dtype)

    def _forward_flat(self, image):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        cls_lv, reg_i_lv, reg_r_lv = self.bbox_head(feats, self.strides)
        sizes = [(f.shape[-3], f.shape[-2]) for f in feats]
        gen = AnchorGenerator(strides=list(self.strides), ratios=[1.0],
                              scales=[8])
        levels = gen.grid_priors(sizes)
        nla = tuple(a.shape[0] for a in levels)
        anchors = jnp.asarray(np.concatenate(levels, axis=0))
        pts = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                         (anchors[:, 1] + anchors[:, 3]) * 0.5], axis=-1)
        cls = flatten_level_preds(cls_lv, self.num_classes)
        reg_init = flatten_level_preds(reg_i_lv, 4)
        reg_ref = flatten_level_preds(reg_r_lv, 4)
        return cls, reg_init, reg_ref, anchors, pts, nla

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, reg_init, reg_ref, anchors, pts, nla = self._forward_flat(
            batch['image'])

        def per_image(cls_i, ri, rr, gt, gtl, gtv):
            assign = atss_assign(anchors, nla, gt, gtv, gtl, self.topk)
            pos = assign.assigned_gt_inds > 0
            matched = jnp.clip(assign.assigned_gt_inds - 1, 0,
                               gt.shape[0] - 1)
            gt_m = gt[matched]
            pos_f = pos.astype(jnp.float32)

            boxes_init = distance2bbox(pts, ri)
            boxes_ref = distance2bbox(pts, rr)
            iou_ref = jax.vmap(
                lambda b, g: bbox_overlaps(b[None], g[None])[0, 0])(
                jax.lax.stop_gradient(boxes_ref), gt_m)
            # varifocal: positive targets = refined IoU on the gt class
            q = jnp.zeros_like(cls_i).at[
                jnp.arange(cls_i.shape[0]),
                jnp.clip(assign.labels, 0, self.num_classes - 1)].set(
                jnp.where(pos, iou_ref, 0.0))
            vfl = varifocal_loss(cls_i, q, reduction='sum')
            l_init = giou_loss(boxes_init, gt_m, weight=pos_f,
                               reduction='sum')
            l_ref = giou_loss(boxes_ref, gt_m, weight=pos_f,
                              reduction='sum')
            return vfl, l_init, l_ref, jnp.sum(pos_f)

        vfl, l_init, l_ref, npos = jax.vmap(per_image)(
            cls, reg_init, reg_ref, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_valid'])
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        return dict(loss_cls=jnp.sum(vfl) / denom,
                    loss_bbox=1.5 * jnp.sum(l_init) / denom,
                    loss_bbox_refine=2.0 * jnp.sum(l_ref) / denom)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, _, reg_ref, _, pts, _ = self._forward_flat(batch['image'])
        cfg = self.test_cfg
        c = self.num_classes

        def per_image(cls_i, rr, shape_i):
            probs = jax.nn.sigmoid(cls_i.astype(jnp.float32))
            flat = probs.reshape(-1)
            flat = jnp.where(flat > cfg.score_thr, flat, NEG_INF)
            k = min(cfg.nms_pre, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            p_idx = idx // c
            labels = (idx % c).astype(jnp.int32)
            boxes = distance2bbox(pts[p_idx], rr[p_idx])
            boxes = clip_boxes(boxes, shape_i.astype(boxes.dtype))
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

        dets, labels, valid = jax.vmap(per_image)(cls, reg_ref,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
