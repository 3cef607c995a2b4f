from .iou import bbox_overlaps, bbox_area
from .transforms import (delta2bbox, bbox2delta, clip_boxes, flip_boxes,
                         bbox2result)
from .assigners import max_iou_assign, AssignResult
from .samplers import random_sample, SampleResult
from .coders import (bbox2tblr, tblr2bbox, distance2bbox, bbox2distance)
from .atss_assigner import atss_assign
from .sim_ota import sim_ota_assign, SimOTAResult

__all__ = ['bbox_overlaps', 'bbox_area', 'delta2bbox', 'bbox2delta',
           'clip_boxes', 'flip_boxes', 'bbox2result', 'max_iou_assign',
           'AssignResult', 'random_sample', 'SampleResult', 'bbox2tblr', 'tblr2bbox',
           'distance2bbox', 'bbox2distance', 'atss_assign', 'sim_ota_assign', 'SimOTAResult']
