# reference configs/gn+ws/mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MaskRCNN', num_classes=80,
    backbone_cfg=dict(type='ResNet', depth=50,
                      conv_cfg=dict(type='ConvWS'),
                      norm_cfg=dict(type='GN', num_groups=32,
                                    requires_grad=True)))
lr_config = dict(policy='step', step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
