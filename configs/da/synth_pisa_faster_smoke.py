# PISA Faster R-CNN learning-efficacy row (VERDICT r4 items 4/7;
# reference configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='PISAFasterRCNN')
