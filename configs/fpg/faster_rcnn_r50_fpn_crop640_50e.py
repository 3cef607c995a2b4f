# Counterpart of reference configs/fpg/faster_rcnn_r50_fpn_crop640_50e_coco.py
# (the FPN control row of the FPG comparison)
_base_ = ['./faster_rcnn_r50_fpg_crop640_50e.py']
model = dict(neck_type='FPN')
