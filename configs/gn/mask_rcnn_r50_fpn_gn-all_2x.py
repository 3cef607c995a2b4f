# reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py — GroupNorm
# trunk (head GN is the reference's conv-head option; the shared-FC head
# here is norm-free, docs/PARITY.md).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MaskRCNN', num_classes=80,
    backbone_cfg=dict(type='ResNet', depth=50,
                      norm_cfg=dict(type='GN', num_groups=32,
                                    requires_grad=True)))
lr_config = dict(policy='step', step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
