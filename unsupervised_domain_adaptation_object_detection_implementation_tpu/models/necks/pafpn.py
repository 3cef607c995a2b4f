"""PAFPN neck (reference `mmdet/models/necks/pafpn.py`): FPN + bottom-up
path augmentation (stride-2 downsample convs feeding upward)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import NECKS
from .fpn import FPN


@NECKS.register_module()
class PAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]):
        fpn_outs = FPN(in_channels=tuple(self.in_channels),
                       out_channels=self.out_channels,
                       num_outs=self.num_outs,
                       start_level=self.start_level, dtype=self.dtype,
                       name='fpn')(inputs)
        n_real = len(self.in_channels) - self.start_level
        outs = list(fpn_outs[:n_real])
        # bottom-up augmentation
        for i in range(n_real - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1)] * 2, dtype=self.dtype,
                           name=f'down_{i}')(outs[i])
            outs[i + 1] = outs[i + 1] + down
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f'pafpn_conv_{i}')(o)
            for i, o in enumerate(outs)
        ]
        # keep FPN's extra levels
        outs.extend(fpn_outs[n_real:])
        return tuple(outs)
