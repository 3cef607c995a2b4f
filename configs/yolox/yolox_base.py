# reference configs/yolox/yolox_s_8x8_300e_coco.py model-zoo family
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLOX', num_classes=80)

# reference recipe: SGD 0.01 + YOLOX lr policy (quadratic-exp 5-epoch
# warmup, cosine to 5% floor, last 15 epochs fixed) + mode-switch hook
# that drops Mosaic/MixUp for the final epochs
# (yolox_s_8x8_300e_coco.py:106-137).
optimizer = dict(
    type='SGD', lr=0.01, momentum=0.9, weight_decay=5e-4,
    paramwise_cfg=dict(norm_decay_mult=0., bias_decay_mult=0.))
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy='YOLOX',
    warmup='exp',
    by_epoch=False,
    warmup_by_epoch=True,
    warmup_ratio=1,
    warmup_iters=5,
    num_last_epochs=15,
    min_lr_ratio=0.05)
runner = dict(type='EpochBasedRunner', max_epochs=300)
custom_hooks = [
    dict(type='YOLOXModeSwitchHook', num_last_epochs=15, priority=48),
]
