# Day → Night two-stream dataset template (reference
# da_configs/_base_/datasets/d2n.py, which points at private Zivid VOC
# exports). Any VOC-layout day/night pair drops in via data_root overrides.
dataset_type = 'DADataset'
data_root = 'data/VOCdevkit/'
canvas = (512, 1024)
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
    ann_file=data_root + 'Day-VOC2007/ImageSets/Main/train.txt',
    img_prefix=data_root + 'Day-VOC2007/',
    pipeline=train_pipeline, domain='source')
target = dict(
    type=dataset_type,
    ann_file=data_root + 'Night-VOC2007/ImageSets/Main/train.txt',
    img_prefix=data_root + 'Night-VOC2007/',
    pipeline=train_pipeline, domain='target')
data = dict(
    samples_per_gpu=2,
    train=dict(type='ConcatDataset', datasets=[source, target]),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'Night-VOC2007/ImageSets/Main/val.txt',
        img_prefix=data_root + 'Night-VOC2007/',
        pipeline=test_pipeline, domain='target'),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'Night-VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'Night-VOC2007/',
        pipeline=test_pipeline, domain='target'))
evaluation = dict(interval=1, metric='mAP')
