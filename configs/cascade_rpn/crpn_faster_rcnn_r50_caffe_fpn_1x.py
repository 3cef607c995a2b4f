# Counterpart of reference
# configs/cascade_rpn/crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py:
# CascadeRPN embedded in the Faster R-CNN two-stage loss path
# (rpn_weight=0.7, stage-2 proposals at NMS 0.8 / max 300, RoI head at
# IoU 0.65 with stds (0.04, 0.04, 0.08, 0.08)).
_base_ = ['crpn_r50_caffe_fpn_1x.py']
model = dict(type='CRPNFasterRCNN', num_classes=80)
