# Counterpart of reference configs/fpg/retinanet_r50_fpg-chn128_crop640_50e_coco.py
# — 128-channel FPG (model.neck_channels; heads follow via shape
# inference).
_base_ = ['retinanet_r50_fpg_crop640_50e.py']
model = dict(neck_channels=128)
