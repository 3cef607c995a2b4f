"""Normalization layers for the detection trunk.

The reference trunks train with `norm_eval=True`
(`da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:16`): BatchNorm
running statistics are frozen while the affine scale/bias still receive
gradients. `FrozenBatchNorm` expresses exactly that: stats live in the
`batch_stats` collection and are never updated; the op lowers to a single
fused multiply-add that XLA folds into the preceding convolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BN with permanently frozen running stats; affine params trainable."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        # precompute fused multiplier/offset in fp32, apply in compute dtype
        mul = scale / jnp.sqrt(var.value + self.epsilon)
        off = bias - mean.value * mul
        return x * mul.astype(x.dtype) + off.astype(x.dtype)


class BatchNorm(nn.Module):
    """Live BN (used by the DA alignment heads, which train their norms —
    SURVEY.md §7 'hard parts' #5)."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )(x)


class DropBlock(nn.Module):
    """DropBlock2D plugin (reference `mmcv.cnn.bricks.DropBlock` used via
    backbone `plugins=[dict(cfg=dict(type='DropBlock', ...))]`): drops
    contiguous `block_size` spatial squares with a rate calibrated so the
    expected dropped fraction equals `drop_prob`. Identity when
    `deterministic` (eval) — matching train-only semantics."""

    drop_prob: float = 0.1
    block_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if deterministic or self.drop_prob == 0.0:
            return x
        b, h, w, c = x.shape
        bs = min(self.block_size, h, w)
        gamma = (self.drop_prob / (bs ** 2)
                 * (h * w) / max((h - bs + 1) * (w - bs + 1), 1))
        rng = self.make_rng('dropout')
        seeds = jax.random.bernoulli(
            rng, gamma, (b, h - bs + 1, w - bs + 1, c)).astype(x.dtype)
        pad = [(0, 0), (bs - 1, bs - 1), (bs - 1, bs - 1), (0, 0)]
        seeds = jnp.pad(seeds, pad)
        mask = 1.0 - (jax.lax.reduce_window(
            seeds, 0.0, jax.lax.add, (1, bs, bs, 1), (1, 1, 1, 1),
            'VALID') > 0).astype(x.dtype)
        keep = jnp.maximum(jnp.mean(mask), 1e-6)
        return x * mask / keep
