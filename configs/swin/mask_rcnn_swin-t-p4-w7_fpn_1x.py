# reference configs/swin/mask_rcnn_swin-t-p4-w7_fpn_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80,
             backbone_cfg=dict(type='SwinTransformer'))
optimizer = dict(type='AdamW', lr=0.0001, weight_decay=0.05)
