# Counterpart of reference configs/vfnet/vfnet_r2_101_fpn_mdconv_c3-c5_mstrain_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['vfnet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='Res2Net',
         depth=101,
         dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
         stage_with_dcn=(False, True, True, True)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
data = dict(train=dict(pipeline=[dict(type='LoadImageFromFile'),
         dict(type='LoadAnnotations', with_bbox=True),
         dict(type='Resize',
                 img_scale=[(1333, 640), (1333, 800)],
                 keep_ratio=True,
                 multiscale_mode='range'),
         dict(type='RandomFlip', flip_ratio=0.5),
         dict(type='Normalize'),
         dict(type='Pad', size=(800, 1344)),
         dict(type='PackDetInputs', max_gt=100)]))
