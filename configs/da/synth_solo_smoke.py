# SOLO instance-seg smoke: full-image gt masks at stride 4 via
# PackDetInputs(with_full_masks=True).
_base_ = ['synth_mask_smoke.py']
model = dict(_delete_=True, type='SOLO', backbone_depth=18, num_classes=2,
             frozen_stages=-1)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         mask_size=56),
    dict(type='Resize', img_scale=(192, 128), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(128, 192)),
    dict(type='PackDetInputs', max_gt=10, with_mask=True,
         with_full_masks=True),
]
data = dict(train=dict(pipeline=train_pipeline))
# reference SOLO recipe clips at 35 (`configs/solo/solo_r50_fpn_1x_coco.py`
# optimizer_config); the guard additionally skips any step whose backward
# still overflows (dice+focal spikes early in training)
optimizer = dict(lr=0.005)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2),
                        nan_guard=True)
