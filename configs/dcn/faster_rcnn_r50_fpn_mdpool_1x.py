# Counterpart of reference configs/dcn/faster_rcnn_r50_fpn_mdpool_1x_coco.py
# — modulated deformable RoI pooling (sigmoid per-bin mask).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(roi_layer='mdpool')
