# Counterpart of reference configs/cascade_rcnn/cascade_mask_rcnn_r101_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
