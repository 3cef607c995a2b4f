from .roi_align import roi_align, batched_roi_align
from .roi_align_pallas import roi_align_pallas

__all__ = ['roi_align', 'batched_roi_align', 'roi_align_pallas']
