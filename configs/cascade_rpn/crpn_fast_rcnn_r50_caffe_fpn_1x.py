# Counterpart of reference configs/cascade_rpn/crpn_fast_rcnn_r50_caffe_fpn_1x_coco.py
# — Fast R-CNN trained on precomputed Cascade-RPN proposals
# (batch['proposals']; generate by running tools/test.py on a
# crpn_r50_caffe_fpn_1x checkpoint). caffe img_norm; RoI-head IoU/nms
# thresholds follow the reference row (pos 0.65, nms 0.7 -> max_per_img
# 300 handled by the proposal file).
_base_ = ['../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x.py']
