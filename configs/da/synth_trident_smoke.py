# TridentNet learning-efficacy row (VERDICT r4 item 4; reference
# configs/tridentnet/tridentnet_r50_caffe_1x_coco.py). Bottleneck trunk
# only (trident branches live in layer3), so depth 50.
_base_ = ['synth_zoo_smoke.py']
model = dict(type='TridentFasterRCNN', backbone_depth=50,
             anchor_cfg=dict(scales=[1, 2, 4]))
