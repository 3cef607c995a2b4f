# SCNet learning-efficacy row (VERDICT r4 item 4; reference
# configs/scnet/scnet_r50_fpn_1x_coco.py, semantic branch off as in the
# HTC smoke).
_base_ = ['synth_mask_smoke.py']
model = dict(type='SCNet', with_semantic=False, num_samples=128)
