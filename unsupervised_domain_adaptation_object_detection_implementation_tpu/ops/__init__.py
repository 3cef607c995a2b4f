from .roi_align import roi_align, batched_roi_align
from .roi_align_pallas import roi_align_pallas
from .deform_conv import deform_conv2d, batched_deform_conv2d
from .roi_pool import roi_pool, batched_roi_pool
from .corner_pool import (corner_pool, top_pool, bottom_pool, left_pool,
                          right_pool)
from .point_sample import (point_sample, batched_point_sample,
                           rel_roi_point_to_rel_img_point)
from .carafe import carafe, carafe_normalized
from .ms_deform_attn import ms_deform_attn_core
from .masked_conv import masked_conv2d
from .merge_cells import (resize_to, sum_cell, concat_cell,
                          global_pooling_cell)

__all__ = ['roi_align', 'batched_roi_align', 'roi_align_pallas',
           'deform_conv2d', 'batched_deform_conv2d',
           'roi_pool', 'batched_roi_pool',
           'corner_pool', 'top_pool', 'bottom_pool', 'left_pool',
           'right_pool',
           'point_sample', 'batched_point_sample',
           'rel_roi_point_to_rel_img_point',
           'carafe', 'carafe_normalized', 'ms_deform_attn_core',
           'masked_conv2d',
           'resize_to', 'sum_cell', 'concat_cell', 'global_pooling_cell']
