# Counterpart of reference configs/groie/grid_rcnn_r50_fpn_gn-head_groie_1x_coco.py
# — Grid R-CNN with the GRoIE all-level-sum RoI extractor.
_base_ = ['../grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x.py']
model = dict(roi_extractor_type='groie')
