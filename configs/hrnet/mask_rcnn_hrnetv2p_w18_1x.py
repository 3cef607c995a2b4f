# Counterpart of reference configs/hrnet/mask_rcnn_hrnetv2p_w18_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=18))
