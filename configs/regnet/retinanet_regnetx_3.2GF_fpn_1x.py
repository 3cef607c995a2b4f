# RetinaNet RegNetX (reference configs/regnet/retinanet_regnetx-3.2GF_fpn_1x_coco.py).
_base_ = ['../retinanet/retinanet_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='RegNet'))
