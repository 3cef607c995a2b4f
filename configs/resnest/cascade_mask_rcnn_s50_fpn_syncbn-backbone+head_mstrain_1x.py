# Counterpart of reference configs/resnest/cascade_mask_rcnn_s50_fpn_syncbn-backbone+head_mstrain_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeSt', depth=50))
data = dict(train=dict(pipeline=[dict(type='LoadImageFromFile'),
         dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
         dict(type='Resize',
                 img_scale=[(1333, 640), (1333, 800)],
                 keep_ratio=True,
                 multiscale_mode='range'),
         dict(type='RandomFlip', flip_ratio=0.5),
         dict(type='Normalize'),
         dict(type='Pad', size=(800, 1344)),
         dict(type='PackDetInputs', max_gt=100, with_mask=True)]))
