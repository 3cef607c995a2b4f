# Counterpart of reference configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_90k_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
# caffe row: caffe img_norm constants; torch style='caffe' stride placement
# is dropped by build_trunk (docs/PARITY.md).
_base_ = ['faster_rcnn_r50_fpn_1x.py']
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[60000, 80000])
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=90000)
checkpoint_config = dict(interval=10000)
evaluation = dict(interval=10000, metric='bbox')
data = dict(train=dict(pipeline=[dict(type='LoadImageFromFile'),
         dict(type='LoadAnnotations', with_bbox=True),
         dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
         dict(type='RandomFlip', flip_ratio=0.5),
         dict(type='Normalize',
                 mean=[103.53, 116.28, 123.675],
                 std=[1.0, 1.0, 1.0],
                 to_rgb=False),
         dict(type='Pad', size=(800, 1344)),
         dict(type='PackDetInputs', max_gt=100)]))
