# FCOS HRNetV2p-W32 (reference configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.py).
_base_ = ['../fcos/fcos_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=32))
