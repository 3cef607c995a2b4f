from .roi_align import roi_align, batched_roi_align
from .roi_align_pallas import roi_align_pallas
from .deform_conv import deform_conv2d, batched_deform_conv2d

__all__ = ['roi_align', 'batched_roi_align', 'roi_align_pallas',
           'deform_conv2d', 'batched_deform_conv2d']
