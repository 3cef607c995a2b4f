# Counterpart of reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py
# (mstrain 480-800 + random crop on the 3x schedule)
_base_ = ['./sparse_rcnn_r50_fpn_1x.py']
lr_config = dict(step=[27, 33])
runner = dict(max_epochs=36)
data = dict(train=dict(pipeline=[
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=[(1333, 480), (1333, 800)],
         multiscale_mode='range', keep_ratio=True),
    dict(type='RandomCrop', crop_size=(384, 600), allow_negative_crop=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize'),
    dict(type='Pad', size=(800, 1344)),
    dict(type='PackDetInputs', max_gt=100),
]))
