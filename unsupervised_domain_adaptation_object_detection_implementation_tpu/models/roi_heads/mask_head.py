"""Mask head + static-shape mask targets (reference `FCNMaskHead`,
`mmdet/models/roi_heads/mask_heads/fcn_mask_head.py`, and `mask_target`,
`mmdet/core/mask/mask_target.py`).

TPU-native mask-target design: instead of rasterizing full-image bitmap
masks (ragged, huge — `BitmapMasks` in the reference), the data pipeline
stores each gt instance as a fixed `mask_size`² raster in its own BOX FRAME
(`PackDetInputs(with_mask=True)`). The train-time target for a sampled RoI is
then a bilinear crop of its matched gt's box-frame raster under the affine
map between the RoI and the gt box — one `roi_align` call on a tiny (G, M,
M, 1) "feature map". Exact up to rasterization resolution, fully static.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import batched_roi_align
from ...utils.registry import HEADS
from ..losses import binary_cross_entropy


@HEADS.register_module()
class FCNMaskHead(nn.Module):
    """4×(3×3 conv) → 2× upsample conv → per-class 1×1 logits."""

    num_classes: int = 80
    num_convs: int = 4
    feat_channels: int = 256
    # mmdet `predictor_cfg=dict(type='NormedConv2d')` (seesaw_loss
    # `*_normed_mask_*` rows): L2-normalize both the final 1x1 kernel
    # (per class, over input channels) and the features (over channels),
    # scale by `tempearture` [sic — mmdet's spelling] = 20
    normed_predictor: bool = False
    normed_tempearture: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """(..., R, s, s, C) → (..., R, 2s, 2s, num_classes) logits."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name=f'conv{i}')(x))
        s = x.shape[-2]
        x = jax.image.resize(
            x, (*x.shape[:-3], s * 2, s * 2, x.shape[-1]), method='bilinear')
        x = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype, name='upsample_conv')(x))
        if self.normed_predictor:
            w = self.param('conv_logits_kernel',
                           nn.initializers.lecun_normal(),
                           (self.feat_channels, self.num_classes))
            w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-6)
            xn = x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                      keepdims=True) + 1e-6
                      ).astype(x.dtype)
            return self.normed_tempearture * jnp.einsum(
                '...c,ck->...k', xn, w.astype(x.dtype))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name='conv_logits')(x)


def mask_targets_from_box_frame(gt_masks: jnp.ndarray,
                                gt_boxes: jnp.ndarray,
                                rois: jnp.ndarray,
                                matched_gt: jnp.ndarray,
                                out_size: int = 28) -> jnp.ndarray:
    """Crop sampled-RoI mask targets out of box-frame gt rasters.

    Args:
        gt_masks: (B, G, M, M) rasters of each gt in its own box frame
            (mask[m1, m2] covers the gt box uniformly).
        gt_boxes: (B, G, 4).
        rois: (B, S, 4) sampled RoIs (image coords).
        matched_gt: (B, S) index of the matched gt per RoI.

    Returns:
        (B, S, out, out) float targets in [0, 1].
    """
    b, g, m, _ = gt_masks.shape
    s = rois.shape[1]
    boxes = jnp.take_along_axis(gt_boxes, matched_gt[..., None], axis=1)
    x1, y1 = boxes[..., 0], boxes[..., 1]
    bw = jnp.maximum(boxes[..., 2] - x1, 1e-3)
    bh = jnp.maximum(boxes[..., 3] - y1, 1e-3)
    # RoI in the gt box frame, scaled to the M-sized raster
    rx1 = (rois[..., 0] - x1) / bw * m
    ry1 = (rois[..., 1] - y1) / bh * m
    rx2 = (rois[..., 2] - x1) / bw * m
    ry2 = (rois[..., 3] - y1) / bh * m
    frame_rois = jnp.stack([rx1, ry1, rx2, ry2], axis=-1)      # (B, S, 4)

    # gather each RoI's gt raster, then roi_align on a (S, M, M, 1) map —
    # flattened to one batch so shapes stay static
    rasters = jnp.take_along_axis(
        gt_masks, matched_gt[..., None, None], axis=1)          # (B, S, M, M)
    flat_rasters = rasters.reshape(b * s, m, m, 1).astype(jnp.float32)
    flat_rois = frame_rois.reshape(b * s, 1, 4)
    crops = batched_roi_align(flat_rasters, flat_rois, 1.0, out_size,
                              sampling_ratio=2, aligned=False)
    return crops.reshape(b, s, out_size, out_size)


def mask_loss(mask_logits: jnp.ndarray,
              targets: jnp.ndarray,
              labels: jnp.ndarray,
              pos_weight: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-pixel BCE on each positive RoI's own-class channel
    (reference `FCNMaskHead.loss`)."""
    b, s, h, w, c = mask_logits.shape
    lbl = jnp.clip(labels, 0, c - 1)
    sel = jnp.take_along_axis(
        mask_logits, lbl[..., None, None, None], axis=-1)[..., 0]
    loss = binary_cross_entropy(sel, targets,
                                weight=pos_weight[..., None, None],
                                reduction='sum')
    denom = jnp.maximum(jnp.sum(pos_weight) * h * w, 1.0)
    return dict(loss_mask=loss / denom)
