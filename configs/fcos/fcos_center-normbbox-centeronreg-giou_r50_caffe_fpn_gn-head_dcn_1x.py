# Counterpart of reference
# configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_dcn_1x_coco.py
# (+ DCNv1 on the last head tower conv; the reference's backbone DCNv2
# stages map through backbone_cfg stage_with_dcn).
_base_ = ['fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x.py']
model = dict(dcn_on_last_conv=True)
