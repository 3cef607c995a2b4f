# reference configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='InstaBoost', action_candidate=('normal', 'horizontal', 'skip'),
         action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
         theta=(-1, 1), color_prob=0.5, hflag=False, aug_ratio=0.5),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(train=dict(pipeline=train_pipeline))
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[32, 44])
runner = dict(type='EpochBasedRunner', max_epochs=48)
