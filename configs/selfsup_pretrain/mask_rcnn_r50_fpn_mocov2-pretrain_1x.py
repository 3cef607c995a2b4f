# reference configs/selfsup_pretrain/mask_rcnn_r50_fpn_mocov2-pretrain_
# 1x_coco.py — load a self-supervised R50 converted with
# tools/model_converters/convert_torchvision.py (reference uses
# tools/model_converters/selfsup2mmdet.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=80)
load_from = 'checkpoints/mocov2_r50_converted.ckpt'
