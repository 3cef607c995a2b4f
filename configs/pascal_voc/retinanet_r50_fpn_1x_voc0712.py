# reference configs/pascal_voc/retinanet_r50_fpn_1x_voc0712.py
_base_ = ['./faster_rcnn_r50_fpn_1x_voc0712.py']
model = dict(type='RetinaNet', num_classes=20)
