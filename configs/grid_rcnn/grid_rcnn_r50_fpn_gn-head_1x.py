# Counterpart of reference configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.py
# — 1x schedule row (the grid head is GN-normed by construction here,
# reference grid_head.py norm_cfg=GN(36)).
_base_ = ['grid_rcnn_r50_fpn_2x.py']
lr_config = dict(step=[8, 11])
runner = dict(max_epochs=12)
