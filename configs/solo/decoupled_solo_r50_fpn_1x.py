# Counterpart of reference configs/solo/decoupled_solo_r50_fpn_1x_coco.py
# — separable x/y mask branches (detectors/solo.py decoupled).
_base_ = ['solo_r50_fpn_1x.py']
model = dict(decoupled=True)
