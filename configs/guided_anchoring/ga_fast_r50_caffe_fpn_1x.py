# Counterpart of reference configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x_coco.py
# — Fast R-CNN trained on precomputed GA-RPN proposals
# (batch['proposals'], detectors/rpn_detectors.py FastRCNN; generate by
# running tools/test.py on a ga_rpn_* checkpoint). caffe img_norm.
_base_ = ['../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x.py']
