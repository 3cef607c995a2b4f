# Instance-seg learning-efficacy config: MaskRCNN (or SOLO/etc via
# --cfg-options model.type=...) on the polygon-annotated synthetic shapes.
_base_ = ['../_base_/default_runtime.py']
model = dict(type='MaskRCNN', backbone_depth=18, num_classes=2,
             frozen_stages=-1)
classes = ('square', 'circle')
data_root = '/tmp/synth_da/shapes_seg/'
canvas = (128, 192)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         mask_size=56),
    dict(type='Resize', img_scale=(192, 128), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=canvas),
    dict(type='PackDetInputs', max_gt=10, with_mask=True),
]
test_pipeline = [
    dict(type='MultiScaleFlipAug', img_scale=(192, 128), flip=False,
         transforms=[
             dict(type='LoadImageFromFile'),
             dict(type='Resize', img_scale=(192, 128), keep_ratio=True),
             dict(type='Normalize'),
             dict(type='Pad', size=canvas),
             dict(type='PackDetInputs', max_gt=10),
         ])]
data = dict(
    samples_per_gpu=8,
    train=dict(type='CocoDataset', ann_file=data_root + 'train.json',
               img_prefix=data_root + 'images/', classes=classes,
               pipeline=train_pipeline),
    val=dict(type='CocoDataset', ann_file=data_root + 'test.json',
             img_prefix=data_root + 'images/', classes=classes,
             pipeline=test_pipeline),
    test=dict(type='CocoDataset', ann_file=data_root + 'test.json',
              img_prefix=data_root + 'images/', classes=classes,
              pipeline=test_pipeline))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy='step', warmup='linear', warmup_iters=100,
                 warmup_ratio=0.01, step=[12])
runner = dict(type='EpochBasedRunner', max_epochs=15)
evaluation = dict(interval=5, metric='mAP')
checkpoint_config = dict(interval=15)
