# Counterpart of reference configs/pisa/pisa_mask_rcnn_r50_fpn_1x_coco.py
# — ISR-P/CARL bbox losses + standard mask branch (detectors/pisa.py
# PISAMaskRCNN).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='PISAMaskRCNN', num_classes=80)
