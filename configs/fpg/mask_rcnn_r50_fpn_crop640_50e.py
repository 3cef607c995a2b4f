# Counterpart of reference configs/fpg/mask_rcnn_r50_fpn_crop640_50e_coco.py
_base_ = ['./mask_rcnn_r50_fpg_crop640_50e.py']
model = dict(neck_type='FPN')
