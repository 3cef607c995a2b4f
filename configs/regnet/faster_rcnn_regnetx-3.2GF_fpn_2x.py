# Counterpart of reference configs/regnet/faster_rcnn_regnetx-3.2GF_fpn_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='RegNet', arch='regnetx_3.2gf'))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
