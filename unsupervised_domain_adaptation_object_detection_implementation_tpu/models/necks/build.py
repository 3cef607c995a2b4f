"""Neck selector for FPN-shaped detectors.

The reference swaps necks purely through config (`configs/pafpn/*`,
`configs/nas_fpn/*`, `configs/carafe/*`, `configs/fpg/*`,
`configs/libra_rcnn/*` = FPN+BFP). Here a detector exposes
``neck_type: str`` and constructs :class:`GenericNeck` for any
non-default choice — the default 'FPN' path stays a direct `FPN` child
so existing parameter trees / the mmdet checkpoint converter are
unaffected.

All choices keep the FPN output contract: `num_outs` maps at
`out_channels`, strides (4,)8,16,32,(64,128) — so heads are untouched.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .fpn import FPN
from .pafpn import PAFPN
from .zoo_necks import BFP, FPG, FPN_CARAFE, NASFPN

FPN_NECK_TYPES = ('FPN', 'PAFPN', 'BFP', 'FPN_CARAFE', 'NASFPN', 'FPG')


class GenericNeck(nn.Module):
    """Dispatching neck with the FPN interface (see module docstring)."""

    neck_type: str = 'FPN'
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        t = self.neck_type
        ic = tuple(self.in_channels)
        if t == 'PAFPN':
            return PAFPN(in_channels=ic, out_channels=self.out_channels,
                         num_outs=self.num_outs,
                         start_level=self.start_level, dtype=self.dtype,
                         name='inner')(inputs)
        if t == 'BFP':  # Libra R-CNN: plain FPN then balanced refine
            outs = FPN(in_channels=ic, out_channels=self.out_channels,
                       num_outs=self.num_outs, start_level=self.start_level,
                       add_extra_convs=self.add_extra_convs,
                       dtype=self.dtype, name='fpn')(inputs)
            return BFP(in_channels=self.out_channels,
                       num_levels=self.num_outs, dtype=self.dtype,
                       name='bfp')(outs)
        # the remaining necks consume C{2+start_level}..C5 directly
        sl = self.start_level
        sliced = tuple(inputs[sl:])
        if t == 'FPN_CARAFE':
            return FPN_CARAFE(in_channels=ic[sl:],
                              out_channels=self.out_channels,
                              num_outs=self.num_outs, dtype=self.dtype,
                              name='inner')(sliced)
        if t == 'NASFPN':
            return NASFPN(in_channels=ic[sl:],
                          out_channels=self.out_channels,
                          num_outs=self.num_outs, dtype=self.dtype,
                          name='inner')(sliced)
        if t == 'FPG':
            return FPG(in_channels=ic[sl:], out_channels=self.out_channels,
                       num_outs=self.num_outs, dtype=self.dtype,
                       name='inner')(sliced)
        return FPN(in_channels=ic, out_channels=self.out_channels,
                   num_outs=self.num_outs, start_level=self.start_level,
                   add_extra_convs=self.add_extra_convs, dtype=self.dtype,
                   name='inner')(inputs)


def make_fpn_neck(neck_type: str, *, in_channels, out_channels=256,
                  num_outs=5, start_level=0, add_extra_convs=False, dtype):
    """Setup-time helper: direct FPN for the default, GenericNeck else."""
    if neck_type in ('FPN', None, ''):
        return FPN(in_channels=tuple(in_channels), out_channels=out_channels,
                   num_outs=num_outs, start_level=start_level,
                   add_extra_convs=add_extra_convs, dtype=dtype)
    if neck_type not in FPN_NECK_TYPES:
        raise KeyError(f'unknown neck_type {neck_type!r}; '
                       f'one of {FPN_NECK_TYPES}')
    return GenericNeck(neck_type=neck_type, in_channels=tuple(in_channels),
                       out_channels=out_channels, num_outs=num_outs,
                       start_level=start_level,
                       add_extra_convs=add_extra_convs, dtype=dtype)
