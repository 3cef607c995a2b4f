# Counterpart of reference configs/rpn/rpn_x101_64x4d_fpn_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['rpn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt', depth=101, groups=64, base_width=4))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
