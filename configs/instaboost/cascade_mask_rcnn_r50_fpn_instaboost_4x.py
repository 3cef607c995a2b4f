# Counterpart of reference configs/instaboost/cascade_mask_rcnn_r50_fpn_instaboost_4x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['./mask_rcnn_r50_fpn_instaboost_4x.py']
model = dict(type='CascadeMaskRCNN')
