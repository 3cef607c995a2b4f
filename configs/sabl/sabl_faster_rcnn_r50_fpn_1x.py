# Counterpart of reference configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py
# — side-aware boundary localization RoI head (detectors/sabl_retina.py
# SABLFasterRCNN).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SABLFasterRCNN', backbone_depth=50, num_classes=80)
