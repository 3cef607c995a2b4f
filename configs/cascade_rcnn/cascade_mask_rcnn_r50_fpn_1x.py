# Cascade Mask R-CNN R50-FPN (reference
# configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py):
# three-stage bbox cascade + per-stage FCN mask heads.
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CascadeMaskRCNN', backbone_depth=50, num_classes=80)
