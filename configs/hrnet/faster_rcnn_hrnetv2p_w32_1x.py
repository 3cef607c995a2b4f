# Faster R-CNN HRNetV2p-W32 (reference configs/hrnet/faster_rcnn_hrnetv2p_w32_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='HRNet', base_width=32))
