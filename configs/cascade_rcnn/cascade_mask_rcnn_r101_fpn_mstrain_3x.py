# Counterpart of reference configs/cascade_rcnn/cascade_mask_rcnn_r101_fpn_mstrain_3x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
lr_config = dict(step=[9, 11])
runner = dict(max_epochs=12)
data = dict(train=dict(_delete_=True,
         type='RepeatDataset',
         times=3,
         dataset=dict(type='CocoDataset',
             ann_file='data/coco/annotations/instances_train2017.json',
             img_prefix='data/coco/train2017/',
             pipeline=[dict(type='LoadImageFromFile'),
             dict(type='LoadAnnotations',
                     with_bbox=True,
                     with_mask=True),
             dict(type='Resize',
                     img_scale=[(1333, 640), (1333, 800)],
                     keep_ratio=True,
                     multiscale_mode='range'),
             dict(type='RandomFlip', flip_ratio=0.5),
             dict(type='Normalize'),
             dict(type='Pad', size=(800, 1344)),
             dict(type='PackDetInputs', max_gt=100, with_mask=True)])))
