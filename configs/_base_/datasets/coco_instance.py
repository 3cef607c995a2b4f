# COCO instance-seg base (reference configs/_base_/datasets/coco_instance.py)
_base_ = ['./coco_detection.py']
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100, with_mask=True),
]
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric=['bbox', 'segm'])
