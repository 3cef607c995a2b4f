# reference configs/_base_/datasets/wider_face.py — WIDERFace XML trees.
data_root = 'data/WIDERFace/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='PhotoMetricDistortion', brightness_delta=32,
         contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
         hue_delta=18),
    dict(type='Expand', mean=(123.675, 116.28, 103.53), ratio_range=(1, 4)),
    dict(type='MinIoURandomCrop', min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
         min_crop_size=0.3),
    dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='PackDetInputs', max_gt=200),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
    dict(type='Normalize'),
    dict(type='PackDetInputs', max_gt=200),
]
data = dict(
    samples_per_gpu=8,
    train=dict(type='WIDERFaceDataset',
               ann_file=data_root + 'train.txt',
               img_prefix=data_root + 'WIDER_train/',
               min_size=17, pipeline=train_pipeline),
    val=dict(type='WIDERFaceDataset',
             ann_file=data_root + 'val.txt',
             img_prefix=data_root + 'WIDER_val/',
             pipeline=test_pipeline),
    test=dict(type='WIDERFaceDataset',
              ann_file=data_root + 'val.txt',
              img_prefix=data_root + 'WIDER_val/',
              pipeline=test_pipeline))
evaluation = dict(interval=1, metric='mAP')
