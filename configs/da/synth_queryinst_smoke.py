# QueryInst learning-efficacy row (VERDICT r4 item 4; reference
# configs/queryinst/queryinst_r50_fpn_1x_coco.py — 3 stages / 50
# proposals at smoke scale; AdamW like all query-based rows).
_base_ = ['synth_mask_smoke.py']
model = dict(type='QueryInst', num_stages=3, num_proposals=50)
optimizer = dict(_delete_=True, type='AdamW', lr=0.0002,
                 weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
runner = dict(max_epochs=30)
lr_config = dict(step=[25])
