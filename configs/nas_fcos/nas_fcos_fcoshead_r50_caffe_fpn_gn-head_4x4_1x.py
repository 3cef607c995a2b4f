# Counterpart of reference
# configs/nas_fcos/nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py
# (= the nas_fcos_r50_fpn_1x spelling with the standard FCOS head).
_base_ = ['nas_fcos_r50_fpn_1x.py']
model = dict(head_type='fcos')
