"""Adversarial domain-alignment heads (GRL classifiers).

One configurable family covering every head the reference forks ship:

- `GlobalAlignmentHead` — image-level classifier with optional CBAM/MHSA
  res-block (reference `resnet_da_cbam.py:GlobalAlignmentHead:120` /
  `resnet_da_deep.py` MHSA variant). Emits 2-way domain logits.
- `SRMHead` — MAF's per-stage classifier (`resnet_da.py:SRM:83`).
- `PixelAlignmentHead` — patch/pixel-level 1-channel logit map
  (`resnet_da_cbam.py:LocalAlignmentHead:78`, `resnet_da.py:48`).
- `ImageAlignmentHead` — DAF-original 1×1-conv logit map
  (`resnet_da_daf_org.py:ImgAlignmentHead:120`).
- `InstanceAlignmentHead` — per-RoI classifier over 1024-d shared-FC
  features, optional non-local token mixing
  (`instance_da.py:InstanceAlignmentHead:42`, `_DAF:103`).
- `SharedDAConvHead` — shared conv adapter (`resnet_da_cbam.py:48`).

All heads emit LOGITS. The reference sometimes applies sigmoid before
logits-based losses (e.g. `instance_da.py:80` then FocalLoss,
`resnet_da.py:SRM` then CE) — a double-activation quirk this build fixes;
losses activate exactly once.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..layers.attention import CBAM, MHSA, NonLocalBlock
from ..layers.grl import gradient_reverse


class GlobalAlignmentHead(nn.Module):
    """GRL → stride-2 conv stack (+ attention res-block) → GAP → MLP → 2."""

    channels: int
    attention: Optional[str] = 'cbam'   # 'cbam' | 'mhsa' | None
    grl_weight: float = -1.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, C) → (B, 2) domain logits."""
        c2 = self.channels // 2
        c4 = self.channels // 4
        x = gradient_reverse(x, self.grl_weight)

        def bn(t, name):
            return nn.BatchNorm(use_running_average=not train, name=name)(t)

        def drop(t):
            return nn.Dropout(self.dropout, deterministic=not train)(t)

        res = drop(nn.relu(bn(nn.Conv(c2, (3, 3), strides=(2, 2),
                                      padding=[(1, 1)] * 2, use_bias=False,
                                      name='conv1')(x), 'bn1')))
        # attention res-block (the reference computes this block but wires
        # `conv4` to `res`, discarding it — resnet_da_cbam.py:224; corrected
        # here: the block output feeds the downsampling path)
        t = drop(nn.relu(bn(nn.Conv(c2, (3, 3), padding=[(1, 1)] * 2,
                                    name='conv2')(res), 'bn2')))
        t = drop(bn(nn.Conv(c2, (3, 3), padding=[(1, 1)] * 2,
                            name='conv3')(t), 'bn3'))
        if self.attention == 'cbam':
            t = CBAM(channels=c2, name='cbam')(t)
        elif self.attention == 'mhsa':
            t = MHSA(channels=c2, name='mhsa')(t)
        x = nn.relu(t + res)

        x = drop(nn.relu(bn(nn.Conv(c4, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    name='conv4')(x), 'bn4')))
        x = drop(nn.relu(bn(nn.Conv(c4, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    name='conv5')(x), 'bn5')))
        x = jnp.mean(x, axis=(-3, -2))                       # GAP → (B, C/4)
        x = drop(nn.relu(nn.Dense(c4 // 2, name='fc1')(x)))
        return nn.Dense(2, name='fc2')(x)


class SRMHead(nn.Module):
    """MAF per-stage classifier: 1×1 reduce → 3×3 expand → GAP → FC → 2."""

    channels: int
    grl_weight: float = -1.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        c4 = self.channels // 4
        x = gradient_reverse(x, self.grl_weight)

        def drop(t):
            return nn.Dropout(self.dropout, deterministic=not train)(t)

        x = drop(nn.relu(nn.BatchNorm(use_running_average=not train,
                                      name='bn1')(
            nn.Conv(c4, (1, 1), name='conv1')(x))))
        x = drop(nn.relu(nn.BatchNorm(use_running_average=not train,
                                      name='bn2')(
            nn.Conv(c4 * 9, (3, 3), padding=[(3, 3)] * 2,
                    name='conv2')(x))))
        x = jnp.mean(x, axis=(-3, -2))
        return nn.Dense(2, name='fc')(x)


class PixelAlignmentHead(nn.Module):
    """GRL → 1×1 conv stack → 1-channel patch logit map (strong/local
    alignment). `use_norm` selects the BN+dropout flavor of the CBAM trunk
    vs the plain flavor of `resnet_da.py:48`."""

    channels: int
    use_norm: bool = True
    grl_weight: float = -1.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = gradient_reverse(x, self.grl_weight)
        for i in range(2):
            x = nn.Conv(self.channels, (1, 1), use_bias=False,
                        name=f'conv{i + 1}')(x)
            if self.use_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 name=f'bn{i + 1}')(x)
            x = nn.relu(x)
            if self.use_norm:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(1, (1, 1), use_bias=False, name='conv_out')(x)


class ImageAlignmentHead(nn.Module):
    """DAF-original image-level map: GRL → 1×1(C→512) relu → 1×1(512→1)."""

    channels: int = 2048
    grl_weight: float = -1.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = gradient_reverse(x, self.grl_weight)
        x = nn.relu(nn.Conv(512, (1, 1), name='conv1')(x))
        return nn.Conv(1, (1, 1), name='conv2')(x)


class InstanceAlignmentHead(nn.Module):
    """Per-RoI domain classifier over (N, feat_dim) shared-FC features."""

    feat_dim: int = 1024
    use_nonlocal: bool = True
    grl_weight: float = -1.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (N, feat_dim) → (N, 2) logits."""
        x = gradient_reverse(x, self.grl_weight)
        if self.use_nonlocal:
            x = NonLocalBlock(channels=self.feat_dim, name='nlb')(x)
            hidden = (512, 512)
        else:
            hidden = (self.feat_dim, self.feat_dim)   # DAF plain variant
        for i, h in enumerate(hidden):
            x = nn.relu(nn.Dense(h, name=f'fc{i + 1}')(x))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(2, name='fc_out')(x)


class SharedDAConvHead(nn.Module):
    """GRL → two 3×3 convs with BN, residual relu (shared adapter)."""

    channels: int
    grl_weight: float = -1.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        res = gradient_reverse(x, self.grl_weight)
        t = nn.relu(nn.BatchNorm(use_running_average=not train, name='bn1')(
            nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, name='conv1')(res)))
        t = nn.BatchNorm(use_running_average=not train, name='bn2')(
            nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, name='conv2')(t))
        return nn.relu(t + res)
