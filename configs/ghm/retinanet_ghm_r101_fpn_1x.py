# Counterpart of reference configs/ghm/retinanet_ghm_r101_fpn_1x_coco.py
_base_ = ['./retinanet_ghm_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
