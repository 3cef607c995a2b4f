# Counterpart of reference configs/solo/decoupled_solo_light_r50_fpn_3x_coco.py
# — light row: same grids, reduced scale ranges + small mstrain scales
# (reference DecoupledSOLOLightHead over (852, 352..512) inputs).
_base_ = ['decoupled_solo_r50_fpn_3x.py']
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
        dict(type='Resize',
             img_scale=[(852, 512), (852, 480), (852, 448), (852, 416),
                        (852, 384), (852, 352)],
             multiscale_mode='value', keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize'),
        dict(type='Pad', size=(512, 864)),
        dict(type='PackDetInputs', max_gt=100),
    ]))
