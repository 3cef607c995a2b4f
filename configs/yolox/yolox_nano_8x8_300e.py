# Counterpart of reference configs/yolox/yolox_nano_8x8_300e_coco.py
# nano: reference additionally sets use_depthwise=True; this
# build uses dense convs at nano width (knob documented in
# docs/PARITY.md).
_base_ = ['./yolox_base.py']
model = dict(deepen_factor=0.33, widen_factor=0.25)
