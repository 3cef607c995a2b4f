# Counterpart of reference configs/swin/
# mask_rcnn_swin-t-p4-w7_fpn_ms-crop-3x_coco.py
# (DETR-style multiscale+crop augmentation, AdamW 3x schedule).
_base_ = ['mask_rcnn_swin-t-p4-w7_fpn_1x.py']
model = dict(backbone_cfg=dict(type='SwinTransformer', depths=(2, 2, 6, 2)))

train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='AutoAugment',
         policies=[
             [dict(type='Resize',
                   img_scale=[(480, 1333), (512, 1333), (544, 1333),
                              (576, 1333), (608, 1333), (640, 1333),
                              (672, 1333), (704, 1333), (736, 1333),
                              (768, 1333), (800, 1333)],
                   multiscale_mode='value', keep_ratio=True)],
             [dict(type='Resize',
                   img_scale=[(400, 1333), (500, 1333), (600, 1333)],
                   multiscale_mode='value', keep_ratio=True),
              dict(type='RandomCrop', crop_type='absolute_range',
                   crop_size=(384, 600), allow_negative_crop=True),
              dict(type='Resize',
                   img_scale=[(480, 1333), (512, 1333), (544, 1333),
                              (576, 1333), (608, 1333), (640, 1333),
                              (672, 1333), (704, 1333), (736, 1333),
                              (768, 1333), (800, 1333)],
                   multiscale_mode='value', keep_ratio=True)],
         ]),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(train=dict(pipeline=train_pipeline))
optimizer = dict(
    type='AdamW', lr=0.0001, weight_decay=0.05,
    paramwise_cfg=dict(custom_keys={
        'absolute_pos_embed': dict(decay_mult=0.),
        'relative_position_bias_table': dict(decay_mult=0.),
        'norm': dict(decay_mult=0.)}))
lr_config = dict(warmup_iters=1000, step=[27, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
