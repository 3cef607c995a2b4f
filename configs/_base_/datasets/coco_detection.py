# COCO detection base (reference configs/_base_/datasets/coco_detection.py)
data_root = 'data/coco/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type='CocoDataset',
               ann_file=data_root + 'annotations/instances_train2017.json',
               img_prefix=data_root + 'train2017/',
               pipeline=train_pipeline),
    val=dict(type='CocoDataset',
             ann_file=data_root + 'annotations/instances_val2017.json',
             img_prefix=data_root + 'val2017/',
             pipeline=test_pipeline),
    test=dict(type='CocoDataset',
              ann_file=data_root + 'annotations/instances_val2017.json',
              img_prefix=data_root + 'val2017/',
              pipeline=test_pipeline))
evaluation = dict(interval=1, metric='bbox')
