# Counterpart of reference configs/groie/mask_rcnn_r50_fpn_syncbn-backbone_r4_gcb_c3-c5_groie_1x_coco.py
_base_ = ['./mask_rcnn_r50_fpn_groie_1x.py']
model = dict(backbone_cfg=dict(
    type='ResNet', depth=50,
    plugins=[dict(cfg=dict(type='ContextBlock', ratio=0.25),
                  stages=(False, True, True, True),
                  position='after_conv3')]))
