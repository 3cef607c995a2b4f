# Counterpart of reference configs/detectors/detectors_htc_r101_20e_coco.py
# — HTC + RFP + SAC on an R101 trunk, 20-epoch schedule.
_base_ = ['detectors_htc_r50_1x.py']
model = dict(backbone_depth=101)
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
