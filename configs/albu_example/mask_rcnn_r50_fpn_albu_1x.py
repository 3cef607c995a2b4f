# reference configs/albu_example/mask_rcnn_r50_fpn_albu_1x_coco.py —
# the Albu transform gates on albumentations being importable and
# otherwise passes through unchanged (data/pipelines/extra gated wrapper).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Albu', transforms=[
        dict(type='ShiftScaleRotate', shift_limit=0.0625,
             scale_limit=0.0, rotate_limit=0, interpolation=1, p=0.5),
        dict(type='RandomBrightnessContrast', brightness_limit=[0.1, 0.3],
             contrast_limit=[0.1, 0.3], p=0.2),
    ]),
    dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(train=dict(pipeline=train_pipeline))
