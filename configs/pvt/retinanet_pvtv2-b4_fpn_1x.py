# Counterpart of reference configs/pvt/retinanet_pvtv2-b4_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../retinanet/retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='PyramidVisionTransformerV2', depths=(3, 8, 27, 3)))
