# Mask Scoring R-CNN learning-efficacy row (VERDICT r4 item 4; reference
# configs/ms_rcnn/ms_rcnn_r50_fpn_1x_coco.py).
_base_ = ['synth_mask_smoke.py']
model = dict(type='MaskScoringRCNN')
