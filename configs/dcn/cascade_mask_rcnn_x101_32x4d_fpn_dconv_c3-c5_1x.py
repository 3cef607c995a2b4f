# Counterpart of reference configs/dcn/cascade_mask_rcnn_x101_32x4d_fpn_dconv_c3-c5_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt',
         depth=101,
         groups=32,
         base_width=4,
         dcn=dict(type='DCN', deform_groups=1, fallback_on_stride=False),
         stage_with_dcn=(False, True, True, True)))
