# Counterpart of reference configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco.py
# — deformable RoI pooling (ops/roi_pool.py deform_roi_pool_fpn).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(roi_layer='dpool')
