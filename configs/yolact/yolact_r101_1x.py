# Counterpart of reference configs/yolact/yolact_r101_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['./yolact_r50_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
