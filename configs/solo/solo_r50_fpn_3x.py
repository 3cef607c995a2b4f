# Counterpart of reference configs/solo/solo_r50_fpn_3x_coco.py
_base_ = ['./solo_r50_fpn_1x.py']
lr_config = dict(step=[27, 33])
runner = dict(max_epochs=36)
