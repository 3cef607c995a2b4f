# Counterpart of reference configs/yolo/yolov3_d53_fp16_mstrain-608_273e_coco.py
# (fp16 row -> bf16 on TPU, docs/PARITY.md)
_base_ = ['yolov3_d53_608.py']
model = dict(dtype='bfloat16')
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Expand', mean=[0, 0, 0], ratio_range=(1, 2), prob=0.5),
        dict(type='MinIoURandomCrop', min_ious=(0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
             min_crop_size=0.3),
        dict(type='Resize', img_scale=[(320, 320), (608, 608)], multiscale_mode='range',
             keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='PhotoMetricDistortion'),
        dict(type='Normalize', mean=[0, 0, 0], std=[255., 255., 255.],
             to_rgb=True),
        dict(type='Pad', size=(608, 608)),
        dict(type='PackDetInputs', max_gt=100),
    ]))
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy='step', warmup='linear', warmup_iters=2000,
                 warmup_ratio=0.1, step=[218, 246])
runner = dict(type='EpochBasedRunner', max_epochs=273)
