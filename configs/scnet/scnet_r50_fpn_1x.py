# reference configs/scnet/ model-zoo family
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SCNet', backbone_depth=50, num_classes=80)
