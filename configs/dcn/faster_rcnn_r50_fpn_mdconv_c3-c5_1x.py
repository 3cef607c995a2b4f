# reference configs/dcn/faster_rcnn_r50_fpn_mdconv_c3-c5_1x_coco.py (DCNv2)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='FasterRCNNFPN', num_classes=80,
    backbone_cfg=dict(
        type='ResNet', depth=50,
        dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True)))
