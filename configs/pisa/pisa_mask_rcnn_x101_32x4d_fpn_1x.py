# Counterpart of reference configs/pisa/pisa_mask_rcnn_x101_32x4d_fpn_1x_coco.py
_base_ = ['pisa_mask_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='ResNeXt', depth=101, groups=32,
                               base_width=4))
