# Counterpart of reference configs/libra_rcnn/libra_fast_rcnn_r50_fpn_1x_coco.py
# — Fast R-CNN on precomputed proposals + BFP balanced feature pyramid.
_base_ = ['../fast_rcnn/fast_rcnn_r50_fpn_1x.py']
model = dict(neck_type='BFP')
