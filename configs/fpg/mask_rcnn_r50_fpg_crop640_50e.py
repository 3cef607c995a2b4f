# Counterpart of reference configs/fpg/mask_rcnn_r50_fpg_crop640_50e_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80, neck_type='FPG')
lr_config = dict(policy='step', step=[30, 40])
runner = dict(type='EpochBasedRunner', max_epochs=50)
