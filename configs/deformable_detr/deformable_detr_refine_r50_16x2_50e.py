# Counterpart of reference configs/deformable_detr/deformable_detr_refine_r50_16x2_50e_coco.py
# — iterative box refinement (the deformable_detr_r50_50e.py default).
_base_ = ['deformable_detr_r50_50e.py']
model = dict(with_box_refine=True)
