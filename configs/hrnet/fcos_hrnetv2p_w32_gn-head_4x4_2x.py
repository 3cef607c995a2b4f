# Counterpart of reference configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../fcos/fcos_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=32))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
