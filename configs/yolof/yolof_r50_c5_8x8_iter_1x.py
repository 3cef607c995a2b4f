"""Iter-based YOLOF (reference
`configs/yolof/yolof_r50_c5_8x8_iter-1x_coco.py`): 22500 iters ≈ 1x
epochs at COCO scale; intervals in iterations."""
_base_ = 'yolof_r50_c5_8x8_1x.py'

lr_config = dict(step=[15000, 20000])
runner = dict(_delete_=True, type='IterBasedRunner', max_iters=22500)
checkpoint_config = dict(interval=2500)
evaluation = dict(interval=4500)
log_config = dict(interval=20)
