# Counterpart of reference configs/pvt/retinanet_pvt-m_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../retinanet/retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='PyramidVisionTransformer', depths=(3, 4, 18, 3)))
