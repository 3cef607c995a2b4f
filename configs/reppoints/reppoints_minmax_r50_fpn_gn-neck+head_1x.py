# Counterpart of reference configs/reppoints/reppoints_minmax_r50_fpn_gn-neck+head_1x_coco.py
# — 'minmax' point→box transfer (detectors/reppoints.py:points2bbox).
_base_ = ['reppoints_moment_r50_fpn_gn-neck+head_1x.py']
model = dict(transform_method='minmax')
