# Counterpart of reference configs/scratch/mask_rcnn_r50_fpn_gn-all_scratch_6x_coco.py
# — Mask R-CNN trained from scratch: no frozen stages + GN trunk.
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MaskRCNN', num_classes=80, frozen_stages=-1,
    backbone_cfg=dict(type='ResNet', depth=50, frozen_stages=-1,
                      norm_cfg=dict(type='GN', num_groups=32,
                                    requires_grad=True)))
lr_config = dict(policy='step', step=[65, 71])
runner = dict(type='EpochBasedRunner', max_epochs=73)
