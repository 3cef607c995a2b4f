# CyDA: CycleGAN translation + detection + global DA
# (reference da_configs/_base_/models/faster_rcnn_r50_torch_cyda.py)
_base_ = ['faster_rcnn_r50_daf_c2f.py']
model = dict(type='CyDAFasterRCNN')
