from .grl import gradient_reverse, gradient_scalar
from .norm import FrozenBatchNorm, DropBlock
from .attention import CBAM, NonLocalBlock, MHSA, SELayer

__all__ = ['gradient_reverse', 'gradient_scalar', 'FrozenBatchNorm', 'DropBlock', 'CBAM',
           'NonLocalBlock', 'MHSA', 'SELayer']
