"""YOLOX-PAFPN neck (reference `mmdet/models/necks/yolox_pafpn.py:14`).

Top-down (1×1 reduce → 2× nearest upsample → concat → CSP) then bottom-up
(3×3 s2 downsample → concat → CSP), then per-level 1×1 out convs. Live BN +
SiLU like the CSPDarknet it feeds from.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import NECKS
from ..backbones.csp_darknet import ConvBN, CSPLayer


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2× nearest-neighbour upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


@NECKS.register_module()
class YOLOXPAFPN(nn.Module):
    in_channels: Sequence[int] = (128, 256, 512)
    out_channels: int = 128
    num_csp_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = True):
        n = len(self.in_channels)
        assert len(feats) == n

        # top-down
        inner = list(feats)
        for i in range(n - 1, 0, -1):
            high = ConvBN(self.in_channels[i - 1], 1, dtype=self.dtype,
                          name=f'reduce{n - 1 - i}')(inner[i], train)
            inner[i] = high
            merged = jnp.concatenate([_upsample2x(high), inner[i - 1]],
                                     axis=-1)
            inner[i - 1] = CSPLayer(
                self.in_channels[i - 1], self.num_csp_blocks,
                add_identity=False, dtype=self.dtype,
                name=f'top_down{n - 1 - i}')(merged, train)

        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvBN(self.in_channels[i], 3, stride=2, dtype=self.dtype,
                          name=f'down{i}')(outs[-1], train)
            merged = jnp.concatenate([down, inner[i + 1]], axis=-1)
            outs.append(CSPLayer(
                self.in_channels[i + 1], self.num_csp_blocks,
                add_identity=False, dtype=self.dtype,
                name=f'bottom_up{i}')(merged, train))

        return tuple(
            ConvBN(self.out_channels, 1, dtype=self.dtype,
                   name=f'out{i}')(o, train) for i, o in enumerate(outs))
