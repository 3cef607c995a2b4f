# Counterpart of reference configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py
# — plain Deformable DETR: NO iterative box refinement between decoder
# layers (detectors/deformable_detr.py with_box_refine).
_base_ = ['deformable_detr_r50_50e.py']
model = dict(with_box_refine=False)
