"""Feature Pyramid Network (reference `mmdet/models/necks/fpn.py:11`).

Lateral 1×1 projections + nearest top-down merge + 3×3 smoothing, with the
standard extra-level options (maxpool for Faster R-CNN P6 at test time;
stride-2 convs on input/output for RetinaNet P6/P7).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...utils.registry import NECKS


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False     # False | 'on_input' | 'on_output'
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == len(self.in_channels)
        used = inputs[self.start_level:]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(x)
            for i, x in enumerate(used)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                (*laterals[i].shape[:-3], laterals[i - 1].shape[-3],
                 laterals[i - 1].shape[-2], laterals[i].shape[-1]),
                method='nearest')
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f'fpn_conv_{i}')(l)
            for i, l in enumerate(laterals)
        ]
        # extra levels
        extra_needed = self.num_outs - len(outs)
        if extra_needed > 0:
            if not self.add_extra_convs:
                for _ in range(extra_needed):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                src = used[-1] if self.add_extra_convs == 'on_input' \
                    else outs[-1]
                for i in range(extra_needed):
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                  padding=[(1, 1)] * 2, dtype=self.dtype,
                                  name=f'extra_conv_{i}')(src)
                    outs.append(src)
        return tuple(outs)
