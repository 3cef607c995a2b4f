# reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='FasterRCNNFPN', num_classes=80,
    backbone_cfg=dict(type='ResNet', depth=50,
                      conv_cfg=dict(type='ConvWS'),
                      norm_cfg=dict(type='GN', num_groups=32,
                                    requires_grad=True)))
