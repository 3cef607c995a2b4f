from .iou import bbox_overlaps, bbox_area
from .transforms import (delta2bbox, bbox2delta, clip_boxes, flip_boxes,
                         bbox2result)
from .assigners import max_iou_assign, AssignResult
from .samplers import random_sample, ohem_sample, SampleResult
from .coders import (bbox2tblr, tblr2bbox, distance2bbox, bbox2distance)
from .atss_assigner import atss_assign
from .sim_ota import sim_ota_assign, SimOTAResult
from .extra_assigners import (grid_assign, point_assign, uniform_assign,
                              approx_max_iou_assign, center_region_assign)
from .extra_samplers import (iou_balanced_sample, combined_sample,
                             pseudo_sample, score_hlr_sample,
                             instance_balanced_pos_select,
                             iou_balanced_neg_select, ScoreHLRResult)
from .extra_coders import (bbox_rescale, bbox2bucket, bucket2bbox,
                           legacy_bbox2delta, legacy_delta2bbox,
                           pseudo_encode, pseudo_decode)

__all__ = ['bbox_overlaps', 'bbox_area', 'delta2bbox', 'bbox2delta',
           'clip_boxes', 'flip_boxes', 'bbox2result', 'max_iou_assign',
           'AssignResult', 'random_sample', 'ohem_sample', 'SampleResult',
           'bbox2tblr', 'tblr2bbox',
           'distance2bbox', 'bbox2distance', 'atss_assign', 'sim_ota_assign',
           'SimOTAResult',
           'grid_assign', 'point_assign', 'uniform_assign',
           'approx_max_iou_assign', 'center_region_assign',
           'iou_balanced_sample', 'combined_sample', 'pseudo_sample',
           'score_hlr_sample', 'instance_balanced_pos_select',
           'iou_balanced_neg_select', 'ScoreHLRResult',
           'bbox_rescale', 'bbox2bucket', 'bucket2bbox',
           'legacy_bbox2delta', 'legacy_delta2bbox',
           'pseudo_encode', 'pseudo_decode']
