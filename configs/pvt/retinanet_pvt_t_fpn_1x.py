# RetinaNet PVT-Tiny (reference configs/pvt/retinanet_pvt-t_fpn_1x_coco.py).
_base_ = ['../retinanet/retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='PyramidVisionTransformer'))
optimizer = dict(type='AdamW', lr=0.0001, weight_decay=0.0001)
