# Counterpart of reference configs/res2net/cascade_mask_rcnn_r2_101_fpn_20e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='Res2Net', depth=101))
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
