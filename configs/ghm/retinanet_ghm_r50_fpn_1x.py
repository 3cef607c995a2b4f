# reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py — GHM-C cls
# loss (GHM-R reg stays smooth-L1; docs/PARITY.md).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='RetinaNet', num_classes=80,
             train_cfg=dict(loss_cls='ghm'))
