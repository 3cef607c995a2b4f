# Counterpart of reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_tea.py
# (fork-added single-class "tea" supervised baseline; reference schedule
# SGD 0.01, step@3, 4 epochs over the 3x-repeated split).
_base_ = [
    '../_base_/datasets/tea.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FasterRCNNFPN', num_classes=1)
# supervised baseline trains on the labeled source split only
data = dict(train=dict(_delete_=True, type='DADataset',
                       ann_file='data/VOCdevkit/Tea-Source-VOC2007/'
                                'ImageSets/Main/train.txt',
                       img_prefix='data/VOCdevkit/Tea-Source-VOC2007/',
                       classes=('tea',), domain='source',
                       pipeline=[
                           dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations', with_bbox=True),
                           dict(type='Resize', img_scale=(1000, 600),
                                keep_ratio=True),
                           dict(type='RandomFlip', flip_ratio=0.5),
                           dict(type='Normalize'),
                           dict(type='Pad', size=(512, 1024)),
                           dict(type='PackDetInputs', max_gt=100),
                       ]))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', step=[3])
runner = dict(type='EpochBasedRunner', max_epochs=4)
