# Counterpart of reference configs/grid_rcnn/grid_rcnn_r101_fpn_gn-head_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['grid_rcnn_r50_fpn_2x.py']
model = dict(backbone_cfg=dict(type='ResNet', depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
