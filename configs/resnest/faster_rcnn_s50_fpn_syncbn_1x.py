# Faster R-CNN ResNeSt-50 (reference
# configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+head_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeSt', depth=50))
