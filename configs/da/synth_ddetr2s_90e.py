# Deformable-DETR two-stage at the longer query-detector schedule (r5:
# the 30-ep smoke plateaued noisy at 0.19 while climbing; plain DDETR
# needed the long schedule for its 0.877 row too).
_base_ = ['synth_ddetr2s_smoke.py']
runner = dict(max_epochs=90)
lr_config = dict(step=[75])
evaluation = dict(interval=15, metric='mAP')
