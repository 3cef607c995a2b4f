"""Shared-2FC bbox head (reference `Shared2FCBBoxHead`,
`mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py:11,241`).

The fork's `forward_train_da` (`convfc_bbox_head.py:198-239`) — which also
returns the post-shared-FC 1024-d feature for the instance-level domain
discriminator — is the default here: the head always returns
(cls, reg, shared_feat); callers ignore what they don't need.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import HEADS


@HEADS.register_module()
class NormedLinear(nn.Module):
    """L2-normalized linear classifier (reference
    `mmdet/models/utils/normed_predictor.py` NormedLinear — the seesaw
    configs' `cls_predictor_cfg=dict(type='NormedLinear', tempearture=20)`).
    """

    features: int
    temperature: float = 20.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        kn = kernel / (jnp.linalg.norm(kernel, axis=0, keepdims=True) + 1e-6)
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
        return (self.temperature
                * jnp.dot(xn, kn.astype(x.dtype)) + bias.astype(x.dtype))


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 8
    in_channels: int = 2048
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    # Seesaw head shape (reference `configs/seesaw_loss/*`): NormedLinear
    # classifier with K object logits + 2 fg/bg objectness logits.
    seesaw: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """roi_feats: (..., R, 7, 7, C) — or pre-flattened (..., R, 7·7·C)
        from `extract_roi_feats(flatten=True)` — → cls (..., R, K+1) — or
        (..., R, K+2) seesaw layout — reg (..., R, 4 or K*4),
        shared_feat (..., R, 1024)."""
        if roi_feats.ndim >= 4:          # (..., yb, xb, C): flatten last 3
            # x-major order, matching extract_roi_feats(flatten=True) —
            # see ops/roi_align.py:batched_roi_align flatten-order note
            flat = jnp.swapaxes(roi_feats, -3, -2).reshape(
                *roi_feats.shape[:-3], -1)
        else:                            # already (..., o·o·C) x-major
            flat = roi_feats
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc1')(flat))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc2')(x))
        if self.seesaw:
            cls = NormedLinear(self.num_classes + 2, dtype=self.dtype,
                               name='fc_cls')(x)
        else:
            cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                           name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype, name='fc_reg')(x)
        return cls, reg, x
