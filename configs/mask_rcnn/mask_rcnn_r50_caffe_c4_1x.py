# Counterpart of reference configs/mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.py
# (configs/_base_/models/mask_rcnn_r50_caffe_c4.py:37-48): shared-res5 RoI
# trunk, 14x14/stride-16 extraction, num_convs=0 mask head at 14x14.
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNNC4', backbone_depth=50, num_classes=80)
