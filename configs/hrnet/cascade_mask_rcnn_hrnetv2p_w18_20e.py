# Counterpart of reference configs/hrnet/cascade_mask_rcnn_hrnetv2p_w18_20e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=18))
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
