# Faster R-CNN R50-FPN with soft-NMS at test time (reference
# configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py:2-6 —
# `nms=dict(type='soft_nms', iou_threshold=0.5)` in test_cfg.rcnn).
_base_ = ['./faster_rcnn_r50_fpn_1x.py']
model = dict(
    roi_test_cfg=dict(nms_type='soft_nms', nms_iou_threshold=0.5,
                      soft_method='linear', soft_sigma=0.5,
                      soft_min_score=1e-3))
