# Three-row UDAOD protocol, row 3 (upper bound): supervised Faster R-CNN on
# fully-labeled FoggyCityscapes — the oracle a DA method is measured against
# (reference da_configs/_base_/datasets/oracle.py role). Same trunk and
# schedule as the DAF and source-only rows.
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/c2foggy_oracle.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNN',
             roi_head=dict(bbox_head=dict(num_classes=8)))
