# Counterpart of reference configs/yolox/yolox_x_8x8_300e_coco.py
_base_ = ['./yolox_base.py']
model = dict(deepen_factor=1.33, widen_factor=1.25)
