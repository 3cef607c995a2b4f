# Supervised Faster R-CNN R50-DC5 (reference configs/faster_rcnn/
# faster_rcnn_r50_caffe_dc5_1x_coco.py shape) — same trunk as the DA models.
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/c2foggy.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNN')
