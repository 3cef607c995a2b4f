# Counterpart of reference configs/faster_rcnn/faster_rcnn_r50_fpn_ciou_1x_coco.py
# (bbox_head.loss_bbox=dict(type='CIoULoss', loss_weight=12.0), reg_decoded_bbox=True
# -> decoded-box RoI regression loss, models/roi_heads/standard_roi_head.py).
_base_ = ['faster_rcnn_r50_fpn_1x.py']
model = dict(roi_train_cfg=dict(reg_loss='ciou', reg_loss_weight=12.0))
