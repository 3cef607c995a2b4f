# Counterpart of reference configs/mask_rcnn/mask_rcnn_r50_fpn_poly_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['mask_rcnn_r50_fpn_1x.py']
