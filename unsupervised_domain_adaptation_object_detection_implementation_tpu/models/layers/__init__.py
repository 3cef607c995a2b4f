from .grl import gradient_reverse, gradient_scalar
from .norm import FrozenBatchNorm
from .attention import CBAM, NonLocalBlock, MHSA, SELayer

__all__ = ['gradient_reverse', 'gradient_scalar', 'FrozenBatchNorm', 'CBAM',
           'NonLocalBlock', 'MHSA', 'SELayer']
