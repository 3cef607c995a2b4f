# Counterpart of reference configs/solo/decoupled_solo_r50_fpn_3x_coco.py
_base_ = ['solo_r50_fpn_3x.py']
model = dict(decoupled=True)
