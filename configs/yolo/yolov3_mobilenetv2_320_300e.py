# Counterpart of reference configs/yolo/yolov3_mobilenetv2_320_300e_coco.py
# (MobileNetV2 trunk, neck/head widths 96).
_base_ = ['yolov3_d53_608.py']
model = dict(backbone_cfg=dict(type='MobileNetV2'),
             neck_channels=(96, 96, 96))
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Expand', mean=[0, 0, 0], ratio_range=(1, 2), prob=0.5),
        dict(type='MinIoURandomCrop', min_ious=(0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
             min_crop_size=0.3),
        dict(type='Resize', img_scale=(320, 320), multiscale_mode='value',
             keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='PhotoMetricDistortion'),
        dict(type='Normalize', mean=[0, 0, 0], std=[255., 255., 255.],
             to_rgb=True),
        dict(type='Pad', size=(320, 320)),
        dict(type='PackDetInputs', max_gt=100),
    ]))
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy='step', warmup='linear', warmup_iters=2000,
                 warmup_ratio=0.1, step=[218, 246])
runner = dict(type='EpochBasedRunner', max_epochs=300)
