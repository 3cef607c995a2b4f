# reference configs/cityscapes/mask_rcnn_r50_fpn_1x_cityscapes.py
_base_ = ['./faster_rcnn_r50_fpn_1x_cityscapes.py']
model = dict(type='MaskRCNN', num_classes=8)
