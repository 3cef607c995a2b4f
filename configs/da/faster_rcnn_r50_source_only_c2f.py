# Three-row UDAOD protocol, row 1 (lower bound): supervised Faster R-CNN on
# labeled Cityscapes only, evaluated on FoggyCityscapes — shares the exact
# model trunk and schedule with the DAF row so the comparison is clean
# (reference da_configs/_base_/datasets/source_only*.py role).
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/c2foggy_source_only.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNN',
             roi_head=dict(bbox_head=dict(num_classes=8)))
