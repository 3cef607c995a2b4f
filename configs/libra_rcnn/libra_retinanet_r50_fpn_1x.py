# Counterpart of reference configs/libra_rcnn/libra_retinanet_r50_fpn_1x_coco.py
# — RetinaNet + BFP balanced feature pyramid (balanced-L1 reg notes in
# docs/PARITY.md Libra row).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='RetinaNet', num_classes=80, neck_type='BFP')
