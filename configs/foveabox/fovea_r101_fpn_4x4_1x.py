# Counterpart of reference configs/foveabox/fovea_r101_fpn_4x4_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['fovea_r50_fpn_4x4_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
