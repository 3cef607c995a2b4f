# GA-RetinaNet learning-efficacy row (VERDICT r4 item 4; reference
# configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='GARetinaNet')
