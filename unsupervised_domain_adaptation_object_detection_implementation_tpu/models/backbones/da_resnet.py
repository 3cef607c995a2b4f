"""Domain-adaptive ResNet trunk.

Collapses the reference's seven forked backbone copies — `ResNet_DA`
(`resnet_da.py:460`), `ResNet_DAF` (`resnet_da_daf_org.py:439`),
`ResNet_DA_v2` (`resnet_da_v2.py:499`), `ResNet_DA_CBAM`
(`resnet_da_cbam.py:563`), `ResNet_DA_SWDA` (`resnet_da_swda.py:695`),
`ResNet_DA_Deep` (`resnet_da_deep.py:739`), `ResNet_DA_Tri_Att`
(`resnet_da_tri_att.py:737`) — into ONE trunk with a declarative `taps`
spec: which stages feed which alignment-head type (SURVEY.md §7 step 4).

Variant tap presets (stage indices 0..3 = C2..C5):

    DAF/CBAM (flagship) : pixel@1, global(cbam)@2, global(cbam)@3
    DAF original        : image@3
    MAF                 : srm@1, srm@2, srm@3
    SWDA                : pixel@1, global(cbam)@2
    DeepAlign           : pixel@1, pixel@2, global@2, global@3
    Tri-attention       : DeepAlign with attention='mhsa'
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...utils.registry import BACKBONES
from ..da.heads import (GlobalAlignmentHead, ImageAlignmentHead,
                        PixelAlignmentHead, SRMHead)
from .resnet import ResNet


class Tap(NamedTuple):
    stage: int                      # 0..3 (C2..C5)
    kind: str                       # 'global' | 'srm' | 'pixel' | 'image'
    attention: Optional[str] = None  # for 'global': 'cbam' | 'mhsa' | None


VARIANT_TAPS: Dict[str, Tuple[Tap, ...]] = {
    'daf': (Tap(1, 'pixel'), Tap(2, 'global', 'cbam'), Tap(3, 'global', 'cbam')),
    'daf_org': (Tap(3, 'image'),),
    'maf': (Tap(1, 'srm'), Tap(2, 'srm'), Tap(3, 'srm')),
    'swda': (Tap(1, 'pixel'), Tap(2, 'global', 'cbam')),
    'deep': (Tap(1, 'pixel'), Tap(2, 'pixel'), Tap(2, 'global', 'cbam'),
             Tap(3, 'global', 'cbam')),
    'tri': (Tap(1, 'pixel'), Tap(2, 'pixel'), Tap(2, 'global', 'mhsa'),
            Tap(3, 'global', 'mhsa')),
}


@BACKBONES.register_module()
class DAResNet(nn.Module):
    """Detection trunk (ResNet or Swin) + per-stage GRL alignment heads."""

    depth: int = 50
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = 1
    taps: Tuple[Tap, ...] = VARIANT_TAPS['daf']
    trunk_type: str = 'resnet'        # 'resnet' | 'swin' (Swin-T trunk —
    # the "DeepAlign on Swin-T" target config)
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_variant(cls, variant: str, **kwargs) -> 'DAResNet':
        return cls(taps=VARIANT_TAPS[variant], **kwargs)

    @nn.compact
    def __call__(self, x, train: bool = True, with_da: bool = True):
        """Returns (outs, da_out) where da_out maps tap name →
        (B, 2) global logits or (B, H, W, 1) pixel/image logit maps.

        Inference (`with_da=False`) skips the alignment heads entirely —
        matching the reference where DA detectors test as plain Faster R-CNN
        (`DAFaster_rcnn.py:342-347`).
        """
        if self.trunk_type == 'swin':
            from .swin import SwinTransformer
            trunk = SwinTransformer(out_indices=tuple(self.out_indices),
                                    frozen_stages=self.frozen_stages,
                                    dtype=self.dtype, name='trunk')
        else:
            trunk = ResNet(depth=self.depth, strides=tuple(self.strides),
                           dilations=tuple(self.dilations),
                           out_indices=tuple(self.out_indices),
                           frozen_stages=self.frozen_stages, dtype=self.dtype,
                           name='trunk')
        stages = trunk(x, return_all_stages=True)
        outs = tuple(stages[i] for i in self.out_indices)
        if not with_da:
            return outs, {}

        channels = trunk.stage_channels()
        da_out: Dict[str, jnp.ndarray] = {}
        for t_idx, tap in enumerate(self.taps):
            feat = stages[tap.stage]
            name = f'{tap.kind}_s{tap.stage}_{t_idx}'
            if tap.kind == 'global':
                head = GlobalAlignmentHead(channels=channels[tap.stage],
                                           attention=tap.attention, name=name)
            elif tap.kind == 'srm':
                head = SRMHead(channels=channels[tap.stage], name=name)
            elif tap.kind == 'pixel':
                head = PixelAlignmentHead(channels=channels[tap.stage],
                                          name=name)
            elif tap.kind == 'image':
                head = ImageAlignmentHead(channels=channels[tap.stage],
                                          name=name)
            else:
                raise ValueError(tap.kind)
            da_out[name] = head(feat, train=train)
        return outs, da_out
