# Counterpart of reference configs/guided_anchoring/ga_faster_x101_64x4d_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['ga_faster_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt', depth=101, groups=64, base_width=4))
