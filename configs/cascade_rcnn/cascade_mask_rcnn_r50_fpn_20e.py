# Counterpart of reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['cascade_mask_rcnn_r50_fpn_1x.py']
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
