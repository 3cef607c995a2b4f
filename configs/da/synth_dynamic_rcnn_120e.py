# DynamicRCNN 120-epoch rerun (VERDICT r4 item 6: the 60-ep 0.391 row's
# "schedules need steps to ramp" diagnosis, run to the ramp; reference
# configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='DynamicRCNN')
runner = dict(max_epochs=120)
lr_config = dict(step=[90, 110])
evaluation = dict(interval=20, metric='mAP')
