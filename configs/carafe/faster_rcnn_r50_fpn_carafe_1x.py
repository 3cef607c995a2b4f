# reference configs/carafe/faster_rcnn_r50_fpn_carafe_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=80, neck_type='FPN_CARAFE')
