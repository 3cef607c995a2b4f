# Faithful DAF (Chen et al. CVPR'18) on day→night (reference
# da_configs/faster_rcnn/DAF_Org_d2n.py).
_base_ = ['faster_rcnn_r50_daf_d2n.py']
model = dict(type='DAFasterRCNN_Org')
