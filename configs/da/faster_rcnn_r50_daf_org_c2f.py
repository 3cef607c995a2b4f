# Faithful DAF (Chen et al. CVPR'18) variant
# (reference da_configs/_base_/models/faster_rcnn_r50_torch_daf_org.py)
_base_ = ['faster_rcnn_r50_daf_c2f.py']
model = dict(type='DAFasterRCNN_Org')
