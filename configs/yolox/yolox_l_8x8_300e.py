# Counterpart of reference configs/yolox/yolox_l_8x8_300e_coco.py
_base_ = ['./yolox_base.py']
model = dict(deepen_factor=1.0, widen_factor=1.0)
