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
class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 8
    in_channels: int = 2048
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """roi_feats: (..., R, 7, 7, C) → cls (..., R, K+1),
        reg (..., R, 4 or K*4), shared_feat (..., R, 1024)."""
        r_shape = roi_feats.shape[:-3]
        flat = roi_feats.reshape(*r_shape, -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc1')(flat))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc2')(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype, name='fc_reg')(x)
        return cls, reg, x
