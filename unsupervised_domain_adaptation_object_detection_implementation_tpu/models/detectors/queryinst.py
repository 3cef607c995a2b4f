"""QueryInst (reference `mmdet/models/detectors/queryinst.py` +
`roi_heads/mask_heads/dynamic_mask_head.py`).

Sparse R-CNN's cascade of DII heads plus a per-stage dynamic mask head:
each stage generates per-query 1x1 conv params from the (post-interaction)
proposal features, applies them to that query's 14x14 RoI features, then
4 convs -> 2x upsample -> per-class mask logits. Mask supervision uses the
same stage-wise Hungarian pairing as the box loss (`return_match` from the
shared focal layer loss), with dice loss on box-frame crops of the gt
rasters — the reference's DiceLoss(loss_weight=8) on matched queries.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import batched_roi_align
from ...utils.registry import DETECTORS
from ..losses.extra_losses import dice_loss
from ..roi_heads.mask_head import mask_targets_from_box_frame
from .deformable_detr import _focal_layer_loss
from .detr import _xyxy_to_cxcywh
from .sparse_rcnn import DIIHead, SparseRCNN


class DynamicMaskHead(nn.Module):
    """Dynamic-conv mask head (`dynamic_mask_head.py:15`)."""

    num_classes: int = 80
    dim: int = 256
    dyn_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, prop_feats):
        """roi_feats: (B, N, S, S, D); prop_feats: (B, N, D) →
        (B, N, 2S, 2S, num_classes) mask logits."""
        b, n, s, _, d = roi_feats.shape
        params = nn.Dense(2 * d * self.dyn_dim, dtype=self.dtype,
                          name='dynamic_gen')(prop_feats)
        p1 = params[..., :d * self.dyn_dim].reshape(b, n, d, self.dyn_dim)
        p2 = params[..., d * self.dyn_dim:].reshape(b, n, self.dyn_dim, d)
        x = roi_feats.reshape(b, n, s * s, d)
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_d1')(
            jnp.einsum('bnpd,bndk->bnpk', x, p1)))
        x = nn.relu(nn.LayerNorm(dtype=self.dtype, name='norm_d2')(
            jnp.einsum('bnpk,bnkd->bnpd', x, p2)))
        x = x.reshape(b * n, s, s, d)
        for i in range(4):
            x = nn.relu(nn.Conv(self.dim, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype, name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name='upsample')(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name='conv_logits')(x)
        return logits.reshape(b, n, 2 * s, 2 * s,
                              self.num_classes).astype(jnp.float32)


@DETECTORS.register_module()
class QueryInst(SparseRCNN):
    """QueryInst = SparseRCNN stages + dynamic mask heads
    (`queryinst.py:6`)."""

    mask_roi_size: int = 14
    mask_weight: float = 8.0

    def setup(self):
        super().setup()
        self.mask_heads = [DynamicMaskHead(num_classes=self.num_classes,
                                           dtype=self.dtype,
                                           name=f'mask_stage{i}')
                           for i in range(self.num_stages)]

    def _forward_with_masks(self, image, img_shape):
        """Like SparseRCNN._forward but also keeps per-stage proposal
        features and boxes for the mask branch."""
        feats = self.neck(self.backbone(image.astype(self.dtype)))
        b = image.shape[0]
        hw = img_shape.astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        from .detr import _cxcywh_to_xyxy
        from ...core.bbox.transforms import clip_boxes, delta2bbox
        boxes = _cxcywh_to_xyxy(
            jnp.broadcast_to(self.init_boxes[None],
                             (b, self.num_proposals, 4))) * scale[:, None]
        pf = jnp.broadcast_to(self.init_feats[None].astype(self.dtype),
                              (b, self.num_proposals, 256))
        cls_all, box_all, pf_all = [], [], []
        for head in self.heads:
            roi = self._roi_feats(feats, jax.lax.stop_gradient(boxes))
            cls, delta, pf = head(roi, pf)
            flat_boxes = boxes.reshape(-1, 4)
            flat_delta = delta.reshape(-1, 4)
            boxes = delta2bbox(flat_boxes, flat_delta,
                               stds=(0.5, 0.5, 1.0, 1.0)).reshape(b, -1, 4)
            boxes = jax.vmap(lambda bx, s: clip_boxes(bx, s))(boxes, hw)
            cls_all.append(cls)
            box_all.append(boxes)
            pf_all.append(pf)
        return feats, cls_all, box_all, pf_all

    def _mask_roi_feats(self, feats, boxes):
        b, n, _ = boxes.shape
        w = boxes[:, :, 2] - boxes[:, :, 0]
        h = boxes[:, :, 3] - boxes[:, :, 1]
        lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(jnp.maximum(w * h, 1e-6))
                                     / 224.0 + 1e-8))
        lvl = jnp.clip(lvl, 2, 5) - 2
        out = jnp.zeros((b, n, self.mask_roi_size, self.mask_roi_size, 256),
                        self.dtype)
        for li, f in enumerate(feats):
            r = batched_roi_align(f, boxes,
                                  spatial_scale=1.0 / self.strides[li],
                                  out_size=self.mask_roi_size)
            out = jnp.where((lvl == li)[..., None, None, None],
                            r.astype(self.dtype), out)
        return out

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls_all, box_all, pf_all = self._forward_with_masks(
            batch['image'], batch['img_shape'])
        hw = batch['img_shape'].astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        gt_norm = _xyxy_to_cxcywh(batch['gt_bboxes'] / scale[:, None, :])
        msize = 2 * self.mask_roi_size

        losses: Dict[str, jnp.ndarray] = {}
        for si in range(self.num_stages):
            box_norm = _xyxy_to_cxcywh(box_all[si] / scale[:, None, :])
            c_l, l_l, g_l, match = jax.vmap(
                lambda c, b_, gn, gl, gv: _focal_layer_loss(
                    c, b_, gn, gl, gv, self.num_classes, self.cls_weight,
                    self.l1_weight, self.giou_weight, return_match=True)
            )(cls_all[si], box_norm, gt_norm, batch['gt_labels'],
              batch['gt_valid'])
            tag = '' if si == self.num_stages - 1 else f's{si}.'
            losses[f'{tag}loss_cls'] = jnp.mean(c_l)
            losses[f'{tag}loss_bbox'] = jnp.mean(l_l)
            losses[f'{tag}loss_iou'] = jnp.mean(g_l)

            # mask branch on this stage's (refined) boxes
            boxes_sg = jax.lax.stop_gradient(box_all[si])
            mroi = self._mask_roi_feats(feats, boxes_sg)
            mlogits = self.mask_heads[si](mroi, pf_all[si])   # (B,N,2s,2s,C)
            pos = match >= 0
            midx = jnp.clip(match, 0, batch['gt_bboxes'].shape[1] - 1)
            tgt = mask_targets_from_box_frame(
                batch['gt_masks'], batch['gt_bboxes'], boxes_sg, midx,
                out_size=msize)                                # (B,N,2s,2s)
            lbl = jnp.take_along_axis(
                jnp.clip(batch['gt_labels'], 0, self.num_classes - 1),
                midx, axis=1)
            sel = jnp.take_along_axis(
                mlogits, lbl[..., None, None, None], axis=-1)[..., 0]
            b, n = pos.shape
            d = dice_loss(sel.reshape(b * n, -1),
                          (tgt > 0.5).reshape(b * n, -1))
            d = jnp.sum(d.reshape(b, n) * pos.astype(jnp.float32)) \
                / jnp.maximum(jnp.sum(pos), 1.0)
            losses[f'{tag}loss_mask'] = self.mask_weight * d
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats, cls_all, box_all, pf_all = self._forward_with_masks(
            batch['image'], batch['img_shape'])
        probs = jax.nn.sigmoid(cls_all[-1])
        boxes = box_all[-1]
        k = min(self.test_cfg.max_per_img, self.num_proposals)
        from ...core.bbox.transforms import clip_boxes

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
            return dets, labels, valid, qi

        dets, labels, valid, qi = jax.vmap(per_image)(
            probs, boxes, batch['img_shape'])
        mroi = self._mask_roi_feats(feats, dets[..., :4])
        pf_sel = jnp.take_along_axis(pf_all[-1], qi[..., None], axis=1)
        mlogits = self.mask_heads[-1](mroi, pf_sel)
        lbl = jnp.clip(labels, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            mlogits, lbl[..., None, None, None], axis=-1)[..., 0]
        return dict(dets=dets, labels=labels, valid=valid,
                    masks=jax.nn.sigmoid(sel))

    def __call__(self, batch, train: bool = True):
        if train:
            return self.loss(batch)
        return self.predict(batch)
