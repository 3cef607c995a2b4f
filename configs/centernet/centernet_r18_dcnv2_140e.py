# Counterpart of reference configs/centernet/centernet_r18_dcnv2_140e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['./centernet_r18_140e.py']
model = dict(backbone_cfg=dict(
    type='ResNet', depth=18,
    dcn=dict(type='DCNv2', deform_groups=1,
             fallback_on_stride=False),
    stage_with_dcn=(False, True, True, True)))
