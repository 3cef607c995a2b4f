"""CycleGAN image-translation components for CyDA/CyCADA.

Equivalent of the reference's in-backbone CycleGAN
(`mmdet/models/backbones/resnet_da_v3.py`: `Generator_s2t`/`Generator_t2s`
encoder-resblock-decoder at `:62,141`, `GAN_Discriminator` at `:16`;
pretraining variant `resnet_cycada.py:628`), as standalone flax modules —
the translation network is composed by the detector, not baked into a forked
trunk copy.

TPU notes: instance-norm-free variant uses GroupNorm(1) ≡ InstanceNorm
(single-image stats, batch-independent — safe under data-parallel sharding);
upsampling uses resize+conv (checkerboard-free and faster on TPU than
transpose conv).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _inorm(x, name):
    return nn.GroupNorm(num_groups=None, group_size=1, name=name)(x)


class ResnetGenerator(nn.Module):
    """c7s1-64, d128, d256, R256×n, u128, u64, c7s1-3 (CycleGAN paper)."""

    base: int = 64
    n_blocks: int = 6

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, 3) in [-1, 1] (or normalized) → same shape."""
        b = self.base
        h = nn.Conv(b, (7, 7), padding=[(3, 3)] * 2, name='enc0')(x)
        h = nn.relu(_inorm(h, 'in0'))
        h = nn.Conv(b * 2, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    name='enc1')(h)
        h = nn.relu(_inorm(h, 'in1'))
        h = nn.Conv(b * 4, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    name='enc2')(h)
        h = nn.relu(_inorm(h, 'in2'))
        for i in range(self.n_blocks):
            r = nn.Conv(b * 4, (3, 3), padding=[(1, 1)] * 2,
                        name=f'res{i}_conv1')(h)
            r = nn.relu(_inorm(r, f'res{i}_in1'))
            r = nn.Conv(b * 4, (3, 3), padding=[(1, 1)] * 2,
                        name=f'res{i}_conv2')(r)
            r = _inorm(r, f'res{i}_in2')
            h = h + r
        for i, ch in enumerate((b * 2, b)):
            hh, ww = h.shape[-3] * 2, h.shape[-2] * 2
            h = jax.image.resize(h, (*h.shape[:-3], hh, ww, h.shape[-1]),
                                 method='nearest')
            h = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, name=f'dec{i}')(h)
            h = nn.relu(_inorm(h, f'dec{i}_in'))
        out = nn.Conv(3, (7, 7), padding=[(3, 3)] * 2, name='out')(h)
        return jnp.tanh(out)


class PatchDiscriminator(nn.Module):
    """70×70 PatchGAN: C64-C128-C256-C512 → 1-channel logit map."""

    base: int = 64

    @nn.compact
    def __call__(self, x):
        h = x
        for i, ch in enumerate((self.base, self.base * 2, self.base * 4)):
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                        name=f'conv{i}')(h)
            if i > 0:
                h = _inorm(h, f'in{i}')
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.base * 8, (4, 4), padding=[(1, 1)] * 2,
                    name='conv3')(h)
        h = nn.leaky_relu(_inorm(h, 'in3'), 0.2)
        return nn.Conv(1, (4, 4), padding=[(1, 1)] * 2, name='out')(h)
