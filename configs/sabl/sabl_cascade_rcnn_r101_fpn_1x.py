# Counterpart of reference configs/sabl/sabl_cascade_rcnn_r101_fpn_1x_coco.py
_base_ = ['sabl_cascade_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
