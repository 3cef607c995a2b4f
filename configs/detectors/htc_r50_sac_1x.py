# Counterpart of reference configs/detectors/htc_r50_sac_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='HTC', num_classes=80,
             backbone_cfg=dict(type='DetectoRS_ResNet', depth=50))
