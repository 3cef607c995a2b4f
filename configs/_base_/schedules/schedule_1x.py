# reference da_configs/faster_rcnn/faster_rcnn_r50_daf_c2f.py:7-21
optimizer = dict(type='SGD', lr=0.001, momentum=0.9, weight_decay=0.0005)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.0001, step=[9])
runner = dict(type='EpochBasedRunner', max_epochs=14)
