# reference configs/gcnet/mask_rcnn_r50_fpn_r16_gcb_c3-c5_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MaskRCNN', num_classes=80,
    backbone_cfg=dict(
        type='ResNet', depth=50,
        plugins=[dict(cfg=dict(type='ContextBlock', ratio=1. / 16),
                      stages=(False, True, True, True),
                      position='after_conv3')]))
