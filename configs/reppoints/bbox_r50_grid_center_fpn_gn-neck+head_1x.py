# Counterpart of reference configs/reppoints/bbox_r50_grid_center_fpn_gn-neck+head_1x_coco.py
# — bbox mode with center-point init (docs/PARITY.md).
_base_ = ['bbox_r50_grid_fpn_gn-neck+head_1x.py']
