from .roi_align import roi_align, batched_roi_align

__all__ = ['roi_align', 'batched_roi_align']
