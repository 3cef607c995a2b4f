# reference configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py —
# all-level sum aggregation RoI extractor.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=80,
             roi_extractor_type='groie')
