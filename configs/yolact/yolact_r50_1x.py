# reference configs/yolact/ model-zoo family
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLACT', backbone_depth=50, num_classes=80)
