"""Panoptic FPN (reference `mmdet/models/detectors/panoptic_fpn.py` +
`mmdet/models/seg_heads/panoptic_fpn_head.py` +
`panoptic_fusion_heads/heuristic_fusion_head.py`).

Mask R-CNN plus a semantic (stuff) head: each FPN level runs conv+2x
upsample chains down to stride 4, the sums produce per-pixel logits over
`num_stuff + 1` classes (last = all things merged). Fusion of instance and
stuff predictions into a panoptic map is the reference's heuristic rule,
done host-side in numpy (`heuristic_fuse`) after `predict`.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.registry import DETECTORS
from .mask_rcnn import MaskRCNN, paste_masks

INSTANCE_OFFSET = 1000       # panoptic id = label + inst_id * offset


class PanopticFPNHead(nn.Module):
    """`panoptic_fpn_head.py:22`: per-level upsample chains to stride 4."""

    num_stuff: int = 53
    inner_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # use P2..P5 (strides 4..32); each chain has (level) upsample steps
        target_hw = feats[0].shape[1:3]
        acc = 0.
        for i, f in enumerate(feats[:4]):
            x = f
            steps = max(i, 1)
            for s in range(steps):
                x = nn.relu(nn.Conv(self.inner_channels, (3, 3),
                                    padding=[(1, 1)] * 2, dtype=self.dtype,
                                    name=f'lvl{i}_conv{s}')(x))
                if i > 0:
                    b, hh, ww, c = x.shape
                    x = jax.image.resize(x, (b, hh * 2, ww * 2, c),
                                         method='bilinear')
            acc = acc + x[:, :target_hw[0], :target_hw[1]]
        logits = nn.Conv(self.num_stuff + 1, (1, 1), dtype=self.dtype,
                         name='logits')(acc)
        return logits.astype(jnp.float32)            # (B, H/4, W/4, S+1)


@DETECTORS.register_module()
class PanopticFPN(MaskRCNN):
    num_stuff: int = 53
    semantic_weight: float = 0.5

    def setup(self):
        super().setup()
        self.semantic_head = PanopticFPNHead(num_stuff=self.num_stuff,
                                             dtype=self.dtype)

    def loss(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        losses = super().loss(batch)
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        logits = self.semantic_head(feats)
        if 'gt_semantic_seg' in batch:
            b = logits.shape[0]
            tgt = jax.image.resize(
                batch['gt_semantic_seg'].astype(jnp.int32),
                (b, *logits.shape[1:3]), method='nearest')
            # stuff ids in [0, num_stuff); things are folded to num_stuff;
            # 255 = ignore
            valid = tgt != 255
            tgt = jnp.clip(tgt, 0, self.num_stuff)
            onehot = jax.nn.one_hot(tgt, self.num_stuff + 1)
            ce = -jnp.sum(onehot * jax.nn.log_softmax(logits), -1)
            losses['loss_semantic'] = self.semantic_weight * jnp.sum(
                ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return losses

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = super().predict(batch)
        feats = self.neck(self.backbone(batch['image'].astype(self.dtype)))
        out['semantic'] = self.semantic_head(feats)
        return out

    def __call__(self, batch, train: bool = True):
        return self.loss(batch) if train else self.predict(batch)


def heuristic_fuse(dets: np.ndarray, labels: np.ndarray, valid: np.ndarray,
                   masks: np.ndarray, semantic: np.ndarray,
                   img_hw, num_things: int, num_stuff: int,
                   mask_thr: float = 0.5, overlap_thr: float = 0.5,
                   stuff_area_limit: int = 4096) -> np.ndarray:
    """Heuristic panoptic fusion (reference `heuristic_fusion_head.py:27`):
    paste instances by score order (later = lower score loses contested
    pixels above `overlap_thr`), then fill stuff from the semantic argmax
    where large enough. Returns (H, W) int32 panoptic id map where
    id = label + INSTANCE_OFFSET * instance_index, stuff uses
    label = num_things + stuff_id, void = -1.
    """
    h, w = img_hw
    pan = np.full((h, w), -1, np.int64)
    order = np.argsort(-dets[:, 4])
    inst = 1
    for i in order:
        if not valid[i]:
            continue
        m = paste_masks(masks[i:i + 1], dets[i:i + 1, :4], h, w,
                        thr=mask_thr)[0]
        area = m.sum()
        if area == 0:
            continue
        taken = (pan[m] != -1).sum()
        if taken / max(area, 1) > overlap_thr:
            continue
        m = m & (pan == -1)
        pan[m] = int(labels[i]) + INSTANCE_OFFSET * inst
        inst += 1
    sem = semantic.argmax(-1)
    sem_up = np.asarray(
        jax.image.resize(jnp.asarray(sem[..., None].astype(np.float32)),
                         (h, w, 1), method='nearest'))[..., 0].astype(int)
    for sid in range(num_stuff):
        m = (sem_up == sid) & (pan == -1)
        if m.sum() >= stuff_area_limit:
            pan[m] = num_things + sid
    return pan
