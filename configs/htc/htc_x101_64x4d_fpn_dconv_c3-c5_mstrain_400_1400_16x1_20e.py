# Counterpart of reference configs/htc/htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['htc_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt',
         depth=101,
         groups=64,
         base_width=4,
         dcn=dict(type='DCN', deform_groups=1, fallback_on_stride=False),
         stage_with_dcn=(False, True, True, True)))
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
data = dict(train=dict(pipeline=[dict(type='LoadImageFromFile'),
         dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
         dict(type='Resize',
                 img_scale=[(1333, 400), (1333, 1400)],
                 keep_ratio=True,
                 multiscale_mode='range'),
         dict(type='RandomFlip', flip_ratio=0.5),
         dict(type='Normalize'),
         dict(type='Pad', size=(800, 1344)),
         dict(type='PackDetInputs', max_gt=100, with_mask=True)]))
