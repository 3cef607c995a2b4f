from .nms import (nms, nms_select, batched_nms, multiclass_nms, fast_nms,
                  fast_nms_keep, soft_nms, batched_soft_nms)

__all__ = ['nms', 'nms_select', 'batched_nms', 'multiclass_nms', 'fast_nms',
           'fast_nms_keep', 'soft_nms', 'batched_soft_nms']
