# Counterpart of reference configs/fcos/fcos_center_r50_caffe_fpn_gn-head_1x_coco.py
# (center-sampling positive assignment, bbox_head.center_sampling=True).
_base_ = ['fcos_r50_caffe_fpn_gn-head_1x.py']
model = dict(center_sampling=True, center_sample_radius=1.5)
