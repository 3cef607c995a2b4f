# Counterpart of reference configs/common/mstrain_3x_coco.py — shared
# _base_ block: COCO detection with range-mstrain (1333, 640..800) over a
# 3x-repeated dataset and the matching 3x step schedule.
_base_ = ['../_base_/default_runtime.py']
data = dict(
    samples_per_gpu=2,
    train=dict(
        type='RepeatDataset', times=3,
        dataset=dict(
            type='CocoDataset',
            ann_file='data/coco/annotations/instances_train2017.json',
            img_prefix='data/coco/train2017/',
            pipeline=[
                dict(type='LoadImageFromFile'),
                dict(type='LoadAnnotations', with_bbox=True),
                dict(type='Resize', img_scale=[(1333, 640), (1333, 800)],
                     multiscale_mode='range', keep_ratio=True),
                dict(type='RandomFlip', flip_ratio=0.5),
                dict(type='Normalize'),
                dict(type='Pad', size=(800, 1344)),
                dict(type='PackDetInputs', max_gt=100),
            ])),
    val=dict(
        type='CocoDataset',
        ann_file='data/coco/annotations/instances_val2017.json',
        img_prefix='data/coco/val2017/',
        pipeline=[
            dict(type='MultiScaleFlipAug', img_scale=(1333, 800),
                 flip=False,
                 transforms=[
                     dict(type='LoadImageFromFile'),
                     dict(type='Resize', img_scale=(1333, 800),
                          keep_ratio=True),
                     dict(type='Normalize'),
                     dict(type='Pad', size=(800, 1344)),
                     dict(type='PackDetInputs', max_gt=100),
                 ])]),
    test=dict(
        type='CocoDataset',
        ann_file='data/coco/annotations/instances_val2017.json',
        img_prefix='data/coco/val2017/',
        pipeline=[
            dict(type='MultiScaleFlipAug', img_scale=(1333, 800),
                 flip=False,
                 transforms=[
                     dict(type='LoadImageFromFile'),
                     dict(type='Resize', img_scale=(1333, 800),
                          keep_ratio=True),
                     dict(type='Normalize'),
                     dict(type='Pad', size=(800, 1344)),
                     dict(type='PackDetInputs', max_gt=100),
                 ])]))
evaluation = dict(interval=3, metric='bbox')
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[9, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)
