# Counterpart of reference configs/gcnet/mask_rcnn_r101_fpn_syncbn-backbone_r4_gcb_c3-c5_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet',
         depth=101,
         plugins=[dict(cfg=dict(type='ContextBlock', ratio=0.25),
                 stages=(False, True, True, True),
                 position='after_conv3')]))
