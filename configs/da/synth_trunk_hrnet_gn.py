# HRNet-w18 retry #2 (r5): the r4 diagnosis (RPN never learns) deepens to
# the root cause — this HRNet used FrozenBatchNorm throughout, which is an
# IDENTITY with no pretrained stats, so the from-scratch multi-branch
# fusion sums train unnormalized (AP50 0.0 @ lr 1e-2, 0.06 @ lr 2.5e-3).
# GN retrains the same trunk with live normalization.
_base_ = ['synth_trunk_smoke.py']
model = dict(backbone_cfg=dict(_delete_=True, type='HRNet', base_width=18,
                               norm='gn'))
optimizer = dict(lr=0.005)
runner = dict(max_epochs=30)
lr_config = dict(step=[25])
evaluation = dict(interval=5, metric='mAP')
