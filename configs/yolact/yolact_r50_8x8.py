# Counterpart of reference configs/yolact/yolact_r50_8x8_coco.py —
# 8-gpu x 8 batch row (lr linearly scaled like the reference).
_base_ = ['yolact_r50_1x.py']
data = dict(samples_per_gpu=8)
optimizer = dict(lr=8e-3)
