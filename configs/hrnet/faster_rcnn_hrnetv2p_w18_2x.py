# Counterpart of reference configs/hrnet/faster_rcnn_hrnetv2p_w18_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=18))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
