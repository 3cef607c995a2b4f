# MAFasterRCNN variant (reference da_configs/_base_/models/faster_rcnn_r50_torch_maf.py)
_base_ = ['faster_rcnn_r50_daf_c2f.py']
model = dict(type='MAFasterRCNN')
