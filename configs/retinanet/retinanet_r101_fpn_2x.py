# Counterpart of reference configs/retinanet/retinanet_r101_fpn_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
