# Counterpart of reference configs/mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['mask_rcnn_r50_fpn_1x.py']
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
