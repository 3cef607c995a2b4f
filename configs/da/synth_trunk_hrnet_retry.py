# HRNet-w18 retry row (first wave attempt at lr 0.01 left the RPN
# untrained: all-background head, AP50 0 — see RESULTS.md trunk-wave
# notes): lower lr + longer schedule for the no-pretrain multi-branch
# trunk.
_base_ = ['synth_trunk_smoke.py']
optimizer = dict(lr=0.0025)
runner = dict(max_epochs=30)
lr_config = dict(step=[25])
evaluation = dict(interval=5, metric='mAP')
