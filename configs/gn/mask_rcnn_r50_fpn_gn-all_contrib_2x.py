# Counterpart of reference configs/gn/mask_rcnn_r50_fpn_gn-all_contrib_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet',
         depth=50,
         norm_cfg=dict(type='GN', num_groups=32, requires_grad=True)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
