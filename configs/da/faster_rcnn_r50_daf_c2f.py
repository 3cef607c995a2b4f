# Flagship: DAF (CBAM) Cityscapes → FoggyCityscapes
# (reference da_configs/faster_rcnn/faster_rcnn_r50_daf_c2f.py)
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/c2foggy.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=8)))
