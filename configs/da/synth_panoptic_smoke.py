# Panoptic FPN learning-efficacy row (VERDICT r4 item 4; reference
# configs/panoptic_fpn/panoptic_fpn_r50_fpn_1x_coco.py). The synth
# panoptic benchmark has one stuff class (background); semantic targets
# derive from the instance rasters (PackDetInputs with_semantic).
# Box AP50 from the instance branch is logged during training; PQ comes
# from tools/misc/probe_panoptic_pq.py on the final checkpoint.
_base_ = ['synth_mask_smoke.py']
model = dict(type='PanopticFPN', num_stuff=1)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         mask_size=56),
    dict(type='Resize', img_scale=(192, 128), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(128, 192)),
    dict(type='PackDetInputs', max_gt=10, with_mask=True,
         with_full_masks=True, with_semantic=True, num_stuff=1),
]
data = dict(train=dict(pipeline=train_pipeline))
checkpoint_config = dict(interval=15)
