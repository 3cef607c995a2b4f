# reference configs/_base_/datasets/cityscapes_detection.py — COCO-style
# Cityscapes annotations (tools/dataset_converters/cityscapes.py output).
data_root = 'data/cityscapes/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(2048, 800), (2048, 1024)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(1024, 2048)),
    dict(type='PackDetInputs', max_gt=100),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(2048, 1024), keep_ratio=True),
    dict(type='Normalize'),
    dict(type='Pad', size=(1024, 2048)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(
    samples_per_gpu=1,
    train=dict(type='CityscapesDataset',
               ann_file=data_root +
               'annotations/instancesonly_filtered_gtFine_train.json',
               img_prefix=data_root + 'leftImg8bit/train/',
               pipeline=train_pipeline),
    val=dict(type='CityscapesDataset',
             ann_file=data_root +
             'annotations/instancesonly_filtered_gtFine_val.json',
             img_prefix=data_root + 'leftImg8bit/val/',
             pipeline=test_pipeline),
    test=dict(type='CityscapesDataset',
              ann_file=data_root +
              'annotations/instancesonly_filtered_gtFine_val.json',
              img_prefix=data_root + 'leftImg8bit/val/',
              pipeline=test_pipeline))
evaluation = dict(interval=1, metric='bbox')
