# Counterpart of reference configs/detectors/htc_r50_rfp_1x_coco.py
# — RFP-only HTC ablation (recursive feature pyramid, plain convs).
_base_ = ['detectors_htc_r50_1x.py']
model = dict(sac_stages=())
