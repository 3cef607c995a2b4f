# DeepAlign-on-Swin-T at synth-shapes scale (VERDICT r3 item 3: first
# measured efficacy number for the BASELINE target-config-#5 combination
# — the deepalign_swin_t_c2f.py recipe shrunk onto the synthetic
# clear→foggy benchmark). Swin-T trunk (stride-32 tap), DeepAlign heads,
# same schedule as the DAF synth flagship.
_base_ = ['faster_rcnn_r18_synth_shapes.py']
model = dict(
    type='DAFasterRCNN_Deep',
    backbone=dict(_delete_=True, type='DAResNet', trunk_type='swin',
                  frozen_stages=-1),
    rpn_head=dict(anchor_generator=dict(scales=[1, 2, 4], strides=[32])))
optimizer = dict(lr=0.005)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
ema = dict(momentum=0.999)
runner = dict(max_epochs=30)
evaluation = dict(interval=5, metric='mAP')
lr_config = dict(step=[25])
