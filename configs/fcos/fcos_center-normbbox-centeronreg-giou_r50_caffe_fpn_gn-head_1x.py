# Counterpart of reference
# configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x_coco.py.
# norm_on_bbox / centerness_on_reg / giou are this repo's FCOS defaults
# (models/detectors/fcos.py); the row adds center sampling + nms 0.6.
_base_ = ['fcos_r50_caffe_fpn_gn-head_1x.py']
model = dict(center_sampling=True, center_sample_radius=1.5,
             centerness_on_reg=True, norm_on_bbox=True,
             test_cfg=dict(nms_iou_threshold=0.6))
