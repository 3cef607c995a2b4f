# Faster R-CNN RegNetX (reference configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='RegNet'))
