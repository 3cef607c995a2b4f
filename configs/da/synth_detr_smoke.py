# DETR learning-efficacy config for the synthetic shapes benchmark.
#
# Plain DETR classifies from a SINGLE stride-32 C5 map (reference
# `configs/detr/detr_r50_8x2_150e_coco.py`): the generator's 14-36 px
# shapes are sub-token at the default 192x128 canvas, so class logits
# plateau at chance (ln 2) while boxes still learn — an architecture
# resolution limit, not a bug (DeformableDETR's multi-scale attention
# reaches 0.88 AP50 on the same data). Train DETR at 4x resolution so
# objects span 2-4 tokens, with the reference's AdamW recipe
# (lr 1e-4, backbone lr_mult 0.1, grad clip 0.1).
_base_ = ['synth_zoo_smoke.py']
model = dict(_delete_=True, type='DETR', backbone_depth=18, num_classes=2,
             frozen_stages=-1)
data = dict(
    samples_per_gpu=4,
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(768, 512), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize'),
        dict(type='Pad', size=(512, 768)),
        dict(type='PackDetInputs', max_gt=10),
    ]),
    val=dict(pipeline=[
        dict(type='MultiScaleFlipAug', img_scale=(768, 512), flip=False,
             transforms=[
                 dict(type='LoadImageFromFile'),
                 dict(type='Resize', img_scale=(768, 512), keep_ratio=True),
                 dict(type='Normalize'),
                 dict(type='Pad', size=(512, 768)),
                 dict(type='PackDetInputs', max_gt=10),
             ])]))
optimizer = dict(type='AdamW', lr=0.0001, weight_decay=0.0001,
                 paramwise_cfg=dict(custom_keys=dict(
                     backbone=dict(lr_mult=0.1))))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
runner = dict(max_epochs=150)
evaluation = dict(interval=25, metric='mAP')
checkpoint_config = dict(interval=150)
lr_config = dict(step=[120])
