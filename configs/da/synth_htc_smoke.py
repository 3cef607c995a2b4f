# HTC learning-efficacy row (VERDICT r4 item 4; reference
# configs/htc/htc_r50_fpn_1x_coco.py — semantic branch off: the synth
# split has no stuff annotations, matching the reference's
# htc_without_semantic_r50_fpn_1x_coco.py row).
_base_ = ['synth_mask_smoke.py']
model = dict(type='HTC', with_semantic=False, num_samples=128)
