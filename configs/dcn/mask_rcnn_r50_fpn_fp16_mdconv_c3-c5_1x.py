# Counterpart of reference configs/dcn/mask_rcnn_r50_fpn_fp16_mdconv_c3-c5_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNet',
         depth=50,
         dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
         stage_with_dcn=(False, True, True, True)))
# reference fp16 -> bf16 compute on TPU (apis/train.py fp16 gate)
fp16 = dict(loss_scale=512.)
