# Counterpart of reference configs/lad/lad_r101_paa_r50_fpn_coco_1x.py —
# the reversed distillation direction: R101 student, R50 PAA teacher.
_base_ = ['lad_r50_paa_r101_1x.py']
model = dict(backbone_depth=101, teacher_depth=50)
