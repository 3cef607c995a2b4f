# PointRend learning-efficacy row (VERDICT r4 item 4; reference
# configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py).
_base_ = ['synth_mask_smoke.py']
model = dict(type='PointRend')
