# Counterpart of reference configs/retinanet/retinanet_x101_32x4d_fpn_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt', depth=101, groups=32, base_width=4))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
