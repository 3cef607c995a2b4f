# reference configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py —
# BFP balanced feature pyramid neck (IoU-balanced sampling and balanced-L1
# live in core/bbox; see docs/PARITY.md Libra row).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=80, neck_type='BFP')
