# Deformable-DETR two-stage spot-train (VERDICT r4 item 7; reference
# configs/deformable_detr/deformable_detr_twostage_refine_r50_16x2_50e_coco.py).
# Same AdamW recipe as the measured plain-DDETR 0.877 row.
_base_ = ['synth_zoo_smoke.py']
model = dict(type='DeformableDETR', num_queries=50, as_two_stage=True,
             with_box_refine=True)
optimizer = dict(_delete_=True, type='AdamW', lr=0.0002,
                 weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
runner = dict(max_epochs=30)
lr_config = dict(step=[25])
