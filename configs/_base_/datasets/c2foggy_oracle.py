# Oracle upper bound for Cityscapes → FoggyCityscapes: train supervised on
# labeled FOGGY train, evaluate on Foggy val — the upper row of the standard
# UDAOD three-row protocol (reference da_configs/_base_/datasets/oracle.py
# role: fully-labeled target-domain training).
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
data = dict(
    samples_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + 'Foggy-CityScapes-VOC2012/ImageSets/Main/train.txt',
        img_prefix=data_root + 'Foggy-CityScapes-VOC2012/',
        pipeline=train_pipeline, domain='source'),
    val=dict(
        type=dataset_type,
        ann_file=data_root + 'Foggy-CityScapes-VOC2012/ImageSets/Main/test.txt',
        img_prefix=data_root + 'Foggy-CityScapes-VOC2012/',
        pipeline=test_pipeline, domain='target'),
    test=dict(
        type=dataset_type,
        ann_file=data_root + 'Foggy-CityScapes-VOC2012/ImageSets/Main/test.txt',
        img_prefix=data_root + 'Foggy-CityScapes-VOC2012/',
        pipeline=test_pipeline, domain='target'))
evaluation = dict(interval=1, metric='mAP')
