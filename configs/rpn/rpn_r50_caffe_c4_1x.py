# Counterpart of reference configs/rpn/rpn_r50_caffe_c4_1x_coco.py: the
# standalone-RPN spelling on the C4 single-level trunk.
_base_ = ['rpn_r50_fpn_1x.py']
model = dict(type='RPN', c4=True)
