# Counterpart of reference configs/faster_rcnn/faster_rcnn_r50_fpn_ohem_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['faster_rcnn_r50_fpn_1x.py']
model = dict(roi_train_cfg=dict(sampler_type='ohem'))
