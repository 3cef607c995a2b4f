# Counterpart of reference configs/regnet/mask_rcnn_regnetx-12GF_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='RegNet', arch='regnetx_12gf'))
