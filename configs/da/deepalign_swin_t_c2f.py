# DeepAlign on Swin-T (BASELINE.json target config #5): strong-aug two-stream
# Cityscapes→Foggy with the DeepAlign tap set on a Swin-T trunk, tapped at
# stage 2 (stride 16, 384 ch) to mirror the reference's stride-16 DeepAlign
# layout (`resnet_da_deep.py:1110-1175`); the synth-scale study
# (synth_swin_deepalign.py) showed the stride-32 tap starves the RPN of
# positive anchors. AdamW for the transformer trunk.
_base_ = ['faster_rcnn_r50_daf_c2f.py']
model = dict(
    type='DAFasterRCNN_Deep',
    backbone=dict(_delete_=True, type='DAResNet', trunk_type='swin',
                  out_stride=16, frozen_stages=1),
    rpn_head=dict(anchor_generator=dict(strides=[16])))
optimizer = dict(_delete_=True, type='AdamW', lr=0.0001,
                 weight_decay=0.05)
# strong augmentation on the source/target streams
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='PhotoMetricDistortion'),
    dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(512, 1024)),
    dict(type='PackDetInputs', max_gt=100),
]
data = dict(train=dict(datasets=[
    dict(pipeline=train_pipeline), dict(pipeline=train_pipeline)]))
