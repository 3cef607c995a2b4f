# reference configs/empirical_attention/faster_rcnn_r50_fpn_attention_1111_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='FasterRCNNFPN', num_classes=80,
    backbone_cfg=dict(
        type='ResNet', depth=50,
        plugins=[dict(cfg=dict(type='GeneralizedAttention',
                               spatial_range=-1, num_heads=8,
                               attention_type='1111', kv_stride=2),
                      stages=(False, False, True, True),
                      position='after_conv2')]))
