# Counterpart of reference configs/ssd/ssd512_coco.py
_base_ = ['./ssd300.py']
model = dict(input_size=512)
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='PhotoMetricDistortion'),
        dict(type='Expand', ratio_range=(1, 4)),
        dict(type='MinIoURandomCrop'),
        dict(type='Resize', img_scale=(512, 512), keep_ratio=False),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]),
    val=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(512, 512), keep_ratio=False),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]),
    test=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(512, 512), keep_ratio=False),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]))
