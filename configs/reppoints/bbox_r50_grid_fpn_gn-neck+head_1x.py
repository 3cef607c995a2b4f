# Counterpart of reference configs/reppoints/bbox_r50_grid_fpn_gn-neck+head_1x_coco.py
# — pure-bbox RepPoints: 'minmax' transfer over the point set (the
# reference's grid-point init collapses to the same box param under the
# static point layout here; docs/PARITY.md).
_base_ = ['reppoints_moment_r50_fpn_gn-neck+head_1x.py']
model = dict(transform_method='minmax')
