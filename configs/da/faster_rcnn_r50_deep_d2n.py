# DeepAlign on day→night (reference
# da_configs/faster_rcnn/DeepAlign/faster_rcnn_r50_deep_d2n.py).
_base_ = ['faster_rcnn_r50_daf_d2n.py']
model = dict(type='DAFasterRCNN_Deep')
