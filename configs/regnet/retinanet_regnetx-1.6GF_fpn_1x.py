# Counterpart of reference configs/regnet/retinanet_regnetx-1.6GF_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../retinanet/retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='RegNet', arch='regnetx_1.6gf'))
