from .grl import gradient_reverse, gradient_scalar
from .norm import FrozenBatchNorm, DropBlock
from .attention import CBAM, NonLocalBlock, MHSA, SELayer
from .plugins import (ContextBlock, GeneralizedAttention, WSConv,
                      DeformConv, build_plugin)

__all__ = ['gradient_reverse', 'gradient_scalar', 'FrozenBatchNorm', 'DropBlock', 'CBAM',
           'NonLocalBlock', 'MHSA', 'SELayer', 'ContextBlock',
           'GeneralizedAttention', 'WSConv', 'DeformConv', 'build_plugin']
