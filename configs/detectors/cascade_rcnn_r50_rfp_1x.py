# Counterpart of reference configs/detectors/cascade_rcnn_r50_rfp_1x_coco.py
# (RFP-only ablation: recursive feature pyramid, plain convs)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DetectoRSCascadeRCNN', backbone_depth=50, num_classes=80,
             sac_stages=())
