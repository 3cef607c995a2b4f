# reference configs/_base_/datasets/voc0712.py — VOC07+12 trainval union,
# VOC07 test, (1000, 600) keep-ratio canvas.
data_root = 'data/VOCdevkit/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(608, 1000)),
    dict(type='PackDetInputs', max_gt=60),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='Normalize'),
    dict(type='Pad', size=(608, 1000)),
    dict(type='PackDetInputs', max_gt=60),
]
data = dict(
    samples_per_gpu=2,
    train=dict(
        type='RepeatDataset', times=3,
        dataset=dict(type='ConcatDataset', datasets=[
            dict(type='VOCDataset',
                 ann_file=data_root + 'VOC2007/ImageSets/Main/trainval.txt',
                 img_prefix=data_root + 'VOC2007/',
                 pipeline=train_pipeline),
            dict(type='VOCDataset',
                 ann_file=data_root + 'VOC2012/ImageSets/Main/trainval.txt',
                 img_prefix=data_root + 'VOC2012/',
                 pipeline=train_pipeline),
        ])),
    val=dict(type='VOCDataset',
             ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
             img_prefix=data_root + 'VOC2007/', pipeline=test_pipeline),
    test=dict(type='VOCDataset',
              ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
              img_prefix=data_root + 'VOC2007/', pipeline=test_pipeline))
evaluation = dict(interval=1, metric='mAP')
