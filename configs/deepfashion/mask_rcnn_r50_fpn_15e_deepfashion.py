# reference configs/deepfashion/mask_rcnn_r50_fpn_15e_deepfashion.py
_base_ = [
    '../_base_/datasets/deepfashion.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=15)
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=15)
