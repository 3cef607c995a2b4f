# Counterpart of reference configs/pascal_voc/ssd512_voc0712.py
_base_ = ['../ssd/ssd512.py', '../_base_/datasets/voc0712.py']
model = dict(num_classes=20, size_preset='voc')
# VOC pipelines override the COCO ones from the ssd base
data = dict(
    train=dict(dataset=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='PhotoMetricDistortion'),
        dict(type='Expand', ratio_range=(1, 4)),
        dict(type='MinIoURandomCrop'),
        dict(type='Resize', img_scale=(512, 512), keep_ratio=False),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize'),
        dict(type='PackDetInputs', max_gt=100),
    ])),
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
lr_config = dict(step=[16, 20])
runner = dict(max_epochs=24)
