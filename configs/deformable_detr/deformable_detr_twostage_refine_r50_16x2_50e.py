# Counterpart of reference configs/deformable_detr/deformable_detr_twostage_refine_r50_16x2_50e_coco.py
# — two-stage: encoder tokens propose the initial query boxes
# (detectors/deformable_detr.py as_two_stage) + box refinement.
_base_ = ['deformable_detr_r50_50e.py']
model = dict(with_box_refine=True, as_two_stage=True)
