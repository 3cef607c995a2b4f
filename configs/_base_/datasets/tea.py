# "tea" two-stream dataset template (reference
# da_configs/_base_/datasets/tea.py: Huawei-phone source → Zivid target,
# private VOC exports; the reference DA_Dataset hardcodes CLASSES=('tea',),
# mmdet/datasets/da_dataset.py:24). Same layout with placeholder roots.
dataset_type = 'DADataset'
data_root = 'data/VOCdevkit/'
canvas = (512, 1024)
classes = ('tea',)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=canvas),
    dict(type='PackDetInputs', max_gt=100),
]
test_pipeline = [
    dict(type='MultiScaleFlipAug', img_scale=(1000, 600), flip=False,
         transforms=[
             dict(type='LoadImageFromFile'),
             dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
             dict(type='Normalize'),
             dict(type='Pad', size=canvas),
             dict(type='PackDetInputs', max_gt=100),
         ])
]
source = dict(
    type=dataset_type,
    ann_file=data_root + 'Tea-Source-VOC2007/ImageSets/Main/train.txt',
    img_prefix=data_root + 'Tea-Source-VOC2007/',
    pipeline=train_pipeline, classes=classes, domain='source')
target = dict(
    type=dataset_type,
    ann_file=data_root + 'Tea-Target-VOC2007/ImageSets/Main/train.txt',
    img_prefix=data_root + 'Tea-Target-VOC2007/',
    pipeline=train_pipeline, classes=classes, domain='target')
data = dict(
    samples_per_gpu=2,
    train=dict(type='ConcatDataset', datasets=[source, target]),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'Tea-Target-VOC2007/ImageSets/Main/val.txt',
        img_prefix=data_root + 'Tea-Target-VOC2007/',
        pipeline=test_pipeline, classes=classes, domain='target'),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'Tea-Target-VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'Tea-Target-VOC2007/',
        pipeline=test_pipeline, classes=classes, domain='target'))
evaluation = dict(interval=1, metric='mAP')
