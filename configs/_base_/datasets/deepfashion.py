# reference configs/_base_/datasets/deepfashion.py
data_root = 'data/DeepFashion/In-shop/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(750, 1101), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(1101, 752)),
    dict(type='PackDetInputs', max_gt=20),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(750, 1101), keep_ratio=True),
    dict(type='Normalize'),
    dict(type='Pad', size=(1101, 752)),
    dict(type='PackDetInputs', max_gt=20),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type='DeepFashionDataset',
               ann_file=data_root + 'annotations/DeepFashion_segmentation_train.json',
               img_prefix=data_root + 'Img/', pipeline=train_pipeline),
    val=dict(type='DeepFashionDataset',
             ann_file=data_root + 'annotations/DeepFashion_segmentation_query.json',
             img_prefix=data_root + 'Img/', pipeline=test_pipeline),
    test=dict(type='DeepFashionDataset',
              ann_file=data_root + 'annotations/DeepFashion_segmentation_gallery.json',
              img_prefix=data_root + 'Img/', pipeline=test_pipeline))
evaluation = dict(interval=5, metric='bbox')
