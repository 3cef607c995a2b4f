"""Sparse R-CNN (reference `mmdet/models/detectors/sparse_rcnn.py` +
`mmdet/models/roi_heads/sparse_roi_head.py` +
`bbox_heads/dii_head.py`).

End-to-end sparse set prediction: 100 learnable proposal boxes + features,
refined by 6 cascaded Dynamic Instance Interactive heads — self-attention
over proposal features, dynamic 1x1 convs generated per proposal applied
to its RoI features, FFN, then cls + delta box update. Stage-wise
Hungarian matching (focal cost) exactly like our DETR/DeformableDETR path.

TPU shape: RoIAlign over all proposals is the shared batched kernel; the
per-proposal dynamic convs become one einsum pair (B·N tiny matmuls batch
onto the MXU); matching runs in-jit.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from optax import assignment as optax_assignment

from ...core.bbox.transforms import bbox2delta, clip_boxes, delta2bbox
from ...ops import batched_roi_align
from ...utils.registry import DETECTORS
from ..backbones.build import build_trunk
from ..losses import giou_loss, l1_loss, sigmoid_focal_loss
from ..necks.fpn import FPN
from .deformable_detr import _focal_layer_loss
from .detr import DETRTestConfig, _cxcywh_to_xyxy, _xyxy_to_cxcywh


class DIIHead(nn.Module):
    """Dynamic Instance Interactive head (`dii_head.py:24`)."""

    num_classes: int = 80
    dim: int = 256
    dyn_dim: int = 64
    pooler_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, prop_feats):
        """roi_feats: (B, N, S, S, D); prop_feats: (B, N, D).
        Returns (cls_logits, delta, new_prop_feats)."""
        b, n, s, _, d = roi_feats.shape
        # 1. self-attention among proposal features
        sa = nn.MultiHeadDotProductAttention(num_heads=8, dtype=self.dtype,
                                             name='self_attn')
        pf = nn.LayerNorm(dtype=self.dtype, name='norm_attn')(
            prop_feats + sa(prop_feats, prop_feats, prop_feats))

        # 2. dynamic conv interaction: two generated 1x1 convs
        params = nn.Dense(2 * d * self.dyn_dim, dtype=self.dtype,
                          name='dynamic_gen')(pf)
        p1 = params[..., :d * self.dyn_dim].reshape(b, n, d, self.dyn_dim)
        p2 = params[..., d * self.dyn_dim:].reshape(b, n, self.dyn_dim, d)
        x = roi_feats.reshape(b, n, s * s, d)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_d1')(
            jnp.einsum('bnpd,bndk->bnpk', x, p1)))
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_d2')(
            jnp.einsum('bnpk,bnkd->bnpd', x, p2)))
        x = x.reshape(b, n, s * s * d)
        x = nn.Dense(self.dim, dtype=self.dtype, name='fc_out')(x)
        pf = nn.LayerNorm(dtype=self.dtype, name='norm_inst')(pf + x)

        # 3. FFN
        f = nn.Dense(2048, dtype=self.dtype, name='ffn1')(pf)
        f = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')(nn.relu(f))
        pf = nn.LayerNorm(dtype=self.dtype, name='norm_ffn')(pf + f)

        # heads: 3 cls FCs, 3 reg FCs (dii_head defaults are 1/3)
        c = pf
        for i in range(1):
            c = nn.relu(nn.Dense(self.dim, dtype=self.dtype,
                                 name=f'cls_fc{i}')(c))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       bias_init=nn.initializers.constant(-4.595),
                       name='fc_cls')(c)
        r = pf
        for i in range(3):
            r = nn.relu(nn.Dense(self.dim, dtype=self.dtype,
                                 name=f'reg_fc{i}')(r))
        delta = nn.Dense(4, dtype=self.dtype, name='fc_reg')(r)
        return (cls.astype(jnp.float32), delta.astype(jnp.float32), pf)


@DETECTORS.register_module()
class SparseRCNN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    backbone_cfg: Any = None  # trunk swap: frozen dict cfg (backbones/build.py)
    frozen_stages: int = 1
    num_proposals: int = 100
    num_stages: int = 6
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    cls_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    test_cfg: DETRTestConfig = DETRTestConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_trunk(
            self.backbone_cfg, depth=self.backbone_depth, strides=(1, 2, 2, 2),
            dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3),
            frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(in_channels=self.backbone.stage_channels(),
                        out_channels=256, num_outs=4, dtype=self.dtype)
        self.init_boxes = self.param(
            'init_proposal_boxes', nn.initializers.constant(0.5),
            (self.num_proposals, 4))      # cxcywh normalized; init = image
        self.init_feats = self.param(
            'init_proposal_features', nn.initializers.normal(1.0),
            (self.num_proposals, 256))
        self.heads = [DIIHead(num_classes=self.num_classes,
                              dtype=self.dtype, name=f'stage{i}')
                      for i in range(self.num_stages)]

    def _roi_feats(self, feats, boxes):
        """Level-assigned RoIAlign over the FPN (single level by scale)."""
        b, n, _ = boxes.shape
        w = boxes[:, :, 2] - boxes[:, :, 0]
        h = boxes[:, :, 3] - boxes[:, :, 1]
        lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(jnp.maximum(w * h, 1e-6))
                                     / 224.0 + 1e-8))
        lvl = jnp.clip(lvl, 2, 5) - 2                      # 0..3
        out = jnp.zeros((b, n, 7, 7, 256), self.dtype)
        for li, f in enumerate(feats):
            r = batched_roi_align(f, boxes,
                                  spatial_scale=1.0 / self.strides[li],
                                  out_size=7)
            out = jnp.where((lvl == li)[..., None, None, None],
                            r.astype(self.dtype), out)
        return out

    def _forward(self, image, img_shape):
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        b = image.shape[0]
        hw = img_shape.astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        boxes = _cxcywh_to_xyxy(
            jnp.broadcast_to(self.init_boxes[None],
                             (b, self.num_proposals, 4))) * scale[:, None]
        pf = jnp.broadcast_to(self.init_feats[None].astype(self.dtype),
                              (b, self.num_proposals, 256))
        cls_all, box_all = [], []
        for head in self.heads:
            roi = self._roi_feats(feats, jax.lax.stop_gradient(boxes))
            cls, delta, pf = head(roi, pf)
            flat_boxes = boxes.reshape(-1, 4)
            flat_delta = delta.reshape(-1, 4)
            boxes = delta2bbox(flat_boxes, flat_delta,
                               stds=(0.5, 0.5, 1.0, 1.0)).reshape(b, -1, 4)
            boxes = jax.vmap(lambda bx, s: clip_boxes(bx, s))(
                boxes, hw)
            cls_all.append(cls)
            box_all.append(boxes)
        return cls_all, box_all

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all = self._forward(batch['image'],
                                         batch['img_shape'])
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        gt_norm = _xyxy_to_cxcywh(batch['gt_bboxes'] / scale[:, None, :])

        losses: Dict[str, jnp.ndarray] = {}
        for si in range(self.num_stages):
            box_norm = _xyxy_to_cxcywh(box_all[si] / scale[:, None, :])
            c_l, l_l, g_l = jax.vmap(
                lambda c, b_, gn, gl, gv: _focal_layer_loss(
                    c, b_, gn, gl, gv, self.num_classes, self.cls_weight,
                    self.l1_weight, self.giou_weight)
            )(cls_all[si], box_norm, gt_norm, batch['gt_labels'],
              batch['gt_valid'])
            tag = '' if si == self.num_stages - 1 else f's{si}.'
            losses[f'{tag}loss_cls'] = jnp.mean(c_l)
            losses[f'{tag}loss_bbox'] = jnp.mean(l_l)
            losses[f'{tag}loss_iou'] = jnp.mean(g_l)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls_all, box_all = self._forward(batch['image'],
                                         batch['img_shape'])
        probs = jax.nn.sigmoid(cls_all[-1])
        boxes = box_all[-1]
        k = min(self.test_cfg.max_per_img, self.num_proposals)

        def per_image(p, b_, shape_i):
            flat = p.reshape(-1)
            top, idx = jax.lax.top_k(flat, k)
            qi = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            bx = clip_boxes(b_[qi], shape_i.astype(jnp.float32))
            valid = top > self.test_cfg.score_thr
            dets = jnp.concatenate(
                [bx * valid[:, None],
                 jnp.where(valid, top, 0.0)[:, None]], -1)
            return dets, labels, valid

        dets, labels, valid = jax.vmap(per_image)(probs, boxes,
                                                  batch['img_shape'])
        return dict(dets=dets, labels=labels, valid=valid)

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
