# Tiny smoke config over the committed 2-domain fixtures (tests/data/) —
# used by CLI smoke tests and verification drives. Small trunk, canvas and
# proposal counts so a CPU epoch takes seconds.
_base_ = ['../_base_/models/faster_rcnn_r50_daf.py',
          '../_base_/default_runtime.py']

model = dict(
    backbone=dict(depth=18),
    # fixture boxes are 10-20 px — the flagship anchor scales (min 32 px)
    # never reach IoU 0.3, so use small scales here
    rpn_head=dict(anchor_generator=dict(scales=[1, 2], strides=[16])),
    roi_head=dict(bbox_head=dict(num_classes=2)),
    train_cfg=dict(
        rpn_proposal=dict(nms_pre=256, max_per_img=64),
        rcnn=dict(sampler=dict(num=32))),
    test_cfg=dict(
        rpn=dict(nms_pre=256, max_per_img=64),
        rcnn=dict(max_per_img=10)))

classes = ('car', 'person')
data_root = 'tests/data/'
canvas = (64, 96)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=canvas),
    dict(type='PackDetInputs', max_gt=10),
]
test_pipeline = [
    dict(type='MultiScaleFlipAug', img_scale=(96, 64), flip=False,
         transforms=[
             dict(type='LoadImageFromFile'),
             dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
             dict(type='Normalize'),
             dict(type='Pad', size=canvas),
             dict(type='PackDetInputs', max_gt=10),
         ])
]
data = dict(
    samples_per_gpu=2,
    train=dict(type='ConcatDataset', datasets=[
        dict(type='DADataset',
             ann_file=data_root + 'voc_source/ImageSets/Main/train.txt',
             img_prefix=data_root + 'voc_source/', classes=classes,
             pipeline=train_pipeline, domain='source'),
        dict(type='DADataset',
             ann_file=data_root + 'voc_target/ImageSets/Main/train.txt',
             img_prefix=data_root + 'voc_target/', classes=classes,
             pipeline=train_pipeline, domain='target'),
    ]),
    val=dict(type='DADataset',
             ann_file=data_root + 'voc_target/ImageSets/Main/test.txt',
             img_prefix=data_root + 'voc_target/', classes=classes,
             pipeline=test_pipeline, domain='target'),
    test=dict(type='DADataset',
              ann_file=data_root + 'voc_target/ImageSets/Main/test.txt',
              img_prefix=data_root + 'voc_target/', classes=classes,
              pipeline=test_pipeline, domain='target'))

optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0005)
lr_config = dict(policy='step', warmup='linear', warmup_iters=5,
                 warmup_ratio=0.001, step=[2])
runner = dict(type='EpochBasedRunner', max_epochs=2)
evaluation = dict(interval=1, metric='mAP')
