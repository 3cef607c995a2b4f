# Counterpart of reference configs/groie/mask_rcnn_r50_fpn_groie_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80, roi_extractor_type='groie')
