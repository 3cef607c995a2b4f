# Counterpart of reference configs/gn+ws/faster_rcnn_x50_32x4d_fpn_gn_ws-all_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt',
         depth=50,
         groups=32,
         base_width=4,
         conv_cfg=dict(type='ConvWS'),
         norm_cfg=dict(type='GN', num_groups=32, requires_grad=True)))
