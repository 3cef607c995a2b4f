# reference configs/ld/ model-zoo family
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='LDGFocal', backbone_depth=18, teacher_depth=101, num_classes=80)
