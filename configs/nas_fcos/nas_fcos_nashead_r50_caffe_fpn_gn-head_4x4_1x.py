# Counterpart of reference
# configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py:
# the searched NASFCOSHead branch ([dconv3x3, conv3x3, dconv3x3, conv1x1]
# + GN) over the NASFCOS-FPN cell.
_base_ = ['nas_fcos_r50_fpn_1x.py']
model = dict(head_type='nas')
