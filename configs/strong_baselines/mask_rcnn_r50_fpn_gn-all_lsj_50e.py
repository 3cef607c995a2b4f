# reference configs/strong_baselines/mask_rcnn_r50_fpn_syncbn-all_
# rpn-2conv_lsj_100e_coco.py lineage — GN-everywhere trunk + large-scale
# jitter schedule (SyncBN → GN here: stats-free norm is the TPU-native
# equivalent under pmap/psum; docs/PARITY.md).
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
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), ratio_range=(0.1, 2.0),
         keep_ratio=True),
    dict(type='RandomCrop', crop_size=(800, 1333)),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(policy='step', step=[44, 48])
runner = dict(type='EpochBasedRunner', max_epochs=50)
