# reference configs/_base_/datasets/lvis_v1_instance.py — class-balanced
# oversampling over the federated LVIS v1 annotations.
data_root = 'data/lvis_v1/'
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=300),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=300),
]
data = dict(
    samples_per_gpu=2,
    train=dict(type='ClassBalancedDataset', oversample_thr=1e-3,
               dataset=dict(type='LVISV1Dataset',
                            ann_file=data_root + 'annotations/lvis_v1_train.json',
                            img_prefix=data_root,
                            pipeline=train_pipeline)),
    val=dict(type='LVISV1Dataset',
             ann_file=data_root + 'annotations/lvis_v1_val.json',
             img_prefix=data_root, pipeline=test_pipeline),
    test=dict(type='LVISV1Dataset',
              ann_file=data_root + 'annotations/lvis_v1_val.json',
              img_prefix=data_root, pipeline=test_pipeline))
evaluation = dict(interval=1, metric='bbox')
