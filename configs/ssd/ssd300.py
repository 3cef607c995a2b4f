# Counterpart of reference configs/ssd/ssd300_coco.py — VGG-16 SSD.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SSD', num_classes=80, input_size=300, size_preset='coco')
data = dict(
    samples_per_gpu=8,
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='PhotoMetricDistortion'),
        dict(type='Expand', ratio_range=(1, 4)),
        dict(type='MinIoURandomCrop'),
        dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]),
    val=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]),
    test=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ]))
optimizer = dict(type='SGD', lr=2e-3, momentum=0.9, weight_decay=5e-4)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
