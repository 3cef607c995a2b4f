# Counterpart of reference configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py
# — two bucketing stages with rising IoU thresholds.
_base_ = ['sabl_faster_rcnn_r50_fpn_1x.py']
model = dict(cascade=True)
