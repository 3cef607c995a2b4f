# reference configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py
_base_ = [
    '../_base_/datasets/cityscapes_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=8)
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[7])
runner = dict(type='EpochBasedRunner', max_epochs=8)
load_from = 'checkpoints/faster_rcnn_r50_fpn_1x_coco_converted.ckpt'
