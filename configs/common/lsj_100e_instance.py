# Counterpart of reference configs/common/lsj_100e_coco_instance.py —
# large-scale-jitter (0.1-2.0 resize into a 1024 crop) instance recipe,
# 100 epochs (the SimpleCopyPaste/scratch family base).
_base_ = ['../_base_/default_runtime.py']
image_size = (1024, 1024)
data = dict(
    samples_per_gpu=2,
    train=dict(
        type='CocoDataset',
        ann_file='data/coco/annotations/instances_train2017.json',
        img_prefix='data/coco/train2017/',
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
            dict(type='Resize', img_scale=(1024, 1024),
                 ratio_range=(0.1, 2.0), multiscale_mode='range',
                 keep_ratio=True),
            dict(type='RandomCrop', crop_type='absolute_range',
                 crop_size=(1024, 1024), allow_negative_crop=True),
            dict(type='RandomFlip', flip_ratio=0.5),
            dict(type='Normalize'),
            dict(type='Pad', size=(1024, 1024)),
            dict(type='PackDetInputs', max_gt=100, with_mask=True),
        ]),
    val=dict(
        type='CocoDataset',
        ann_file='data/coco/annotations/instances_val2017.json',
        img_prefix='data/coco/val2017/',
        pipeline=[
            dict(type='MultiScaleFlipAug', img_scale=(1024, 1024),
                 flip=False,
                 transforms=[
                     dict(type='LoadImageFromFile'),
                     dict(type='Resize', img_scale=(1024, 1024),
                          keep_ratio=True),
                     dict(type='Normalize'),
                     dict(type='Pad', size=(1024, 1024)),
                     dict(type='PackDetInputs', max_gt=100),
                 ])]),
    test=dict(
        type='CocoDataset',
        ann_file='data/coco/annotations/instances_val2017.json',
        img_prefix='data/coco/val2017/',
        pipeline=[
            dict(type='MultiScaleFlipAug', img_scale=(1024, 1024),
                 flip=False,
                 transforms=[
                     dict(type='LoadImageFromFile'),
                     dict(type='Resize', img_scale=(1024, 1024),
                          keep_ratio=True),
                     dict(type='Normalize'),
                     dict(type='Pad', size=(1024, 1024)),
                     dict(type='PackDetInputs', max_gt=100),
                 ])]))
evaluation = dict(interval=5, metric=['bbox', 'segm'])
optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=4e-5)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=0.067, step=[90, 96])
runner = dict(type='EpochBasedRunner', max_epochs=100)
