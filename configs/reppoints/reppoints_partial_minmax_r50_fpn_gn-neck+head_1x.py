# Counterpart of reference configs/reppoints/reppoints_partial_minmax_r50_fpn_gn-neck+head_1x_coco.py
# — 'partial_minmax' transfer: box from the first 4 points only.
_base_ = ['reppoints_moment_r50_fpn_gn-neck+head_1x.py']
model = dict(transform_method='partial_minmax')
