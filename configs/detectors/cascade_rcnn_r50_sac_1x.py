# Counterpart of reference configs/detectors/cascade_rcnn_r50_sac_1x_coco.py
# (SAC-only ablation: switchable atrous trunk, plain FPN)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CascadeRCNN', num_classes=80,
             backbone_cfg=dict(type='DetectoRS_ResNet', depth=50))
