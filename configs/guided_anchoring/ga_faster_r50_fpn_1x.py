# Counterpart of reference configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py
# — GA-RPN proposals + Shared2FC RoI head (detectors/rpn_detectors.py
# GAFasterRCNN).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='GAFasterRCNN', backbone_depth=50, num_classes=80)
