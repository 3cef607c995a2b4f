# Counterpart of reference configs/sabl/sabl_retinanet_r101_fpn_gn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['sabl_retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
