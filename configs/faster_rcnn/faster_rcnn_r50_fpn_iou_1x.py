# Counterpart of reference configs/faster_rcnn/faster_rcnn_r50_fpn_iou_1x_coco.py
# (bbox_head.loss_bbox=dict(type='IoULoss', loss_weight=10.0), reg_decoded_bbox=True
# -> decoded-box RoI regression loss, models/roi_heads/standard_roi_head.py).
_base_ = ['faster_rcnn_r50_fpn_1x.py']
model = dict(roi_train_cfg=dict(reg_loss='iou', reg_loss_weight=10.0))
