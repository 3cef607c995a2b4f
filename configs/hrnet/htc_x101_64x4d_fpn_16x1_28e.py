# Counterpart of reference configs/hrnet/htc_x101_64x4d_fpn_16x1_28e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../htc/htc_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt', depth=101, groups=64, base_width=4))
lr_config = dict(step=[24, 27])
runner = dict(max_epochs=28)
