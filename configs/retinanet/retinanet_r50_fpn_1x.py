# RetinaNet R50-FPN (reference configs/retinanet/retinanet_r50_fpn_1x_coco.py)
model = dict(type='RetinaNet', backbone_depth=50, num_classes=80)
data = dict(samples_per_gpu=2,
            train=dict(type='CocoDataset', ann_file='data/coco/annotations/instances_train2017.json',
                       img_prefix='data/coco/train2017/',
                       pipeline=[
                           dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations', with_bbox=True),
                           dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
                           dict(type='RandomFlip', flip_ratio=0.5),
                           dict(type='Normalize'),
                           dict(type='Pad', size=(800, 1344)),
                           dict(type='PackDetInputs', max_gt=100),
                       ]))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)
