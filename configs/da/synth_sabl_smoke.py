# SABL Faster R-CNN spot-train (VERDICT r4 item 7; reference
# configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='SABLFasterRCNN')
