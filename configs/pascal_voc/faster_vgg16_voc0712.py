# Counterpart of reference configs/pascal_voc/faster_vgg16_voc0712.py
# (fork-added VGG16 Faster R-CNN — the classic DA-literature baseline
# trunk; reference _base_/models/faster_rcnn_vgg16.py, trained on the
# single-class tea pair like the reference does).
_base_ = ['faster_rcnn_r50_fpn_1x_tea.py']
model = dict(backbone_cfg=dict(type='VGG', depth=16, frozen_stages=1))
