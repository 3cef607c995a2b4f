# Counterpart of reference configs/seesaw_loss/mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py
_base_ = [
    '../_base_/datasets/lvis_v1_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=1203, loss_cls='seesaw')
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
# 'random' sampling row: plain dataset (no class-balanced oversampling)
data = dict(train=dict(_delete_=True, type='LVISV1Dataset',
                       ann_file='data/lvis_v1/annotations/lvis_v1_train.json',
                       img_prefix='data/lvis_v1/',
                       pipeline=[
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize', img_scale=[(1333, 640), (1333, 672), (1333, 704),
                                   (1333, 736), (1333, 768), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=300),
]))
