# reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py
_base_ = [
    '../_base_/datasets/voc0712.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=20)
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
# actual epoch number is 4*3 with the 3x RepeatDataset
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[3])
runner = dict(type='EpochBasedRunner', max_epochs=4)
