# Counterpart of reference configs/yolox/yolox_m_8x8_300e_coco.py
_base_ = ['./yolox_base.py']
model = dict(deepen_factor=0.67, widen_factor=0.75)
