# Counterpart of reference configs/gn+ws/mask_rcnn_x101_32x4d_fpn_gn_ws-all_20_23_24e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt',
         depth=101,
         groups=32,
         base_width=4,
         conv_cfg=dict(type='ConvWS'),
         norm_cfg=dict(type='GN', num_groups=32, requires_grad=True)))
lr_config = dict(step=[20, 23])
runner = dict(max_epochs=24)
