from .nms import (nms, nms_select, batched_nms, multiclass_nms, fast_nms,
                  fast_nms_keep)

__all__ = ['nms', 'nms_select', 'batched_nms', 'multiclass_nms', 'fast_nms',
           'fast_nms_keep']
