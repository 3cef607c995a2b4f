# Counterpart of reference configs/nas_fpn/retinanet_r50_fpn_crop640_50e_coco.py
# (the plain-FPN control row of the NAS-FPN comparison).
_base_ = ['retinanet_r50_nasfpn_crop640_50e.py']
model = dict(neck_type='FPN')
