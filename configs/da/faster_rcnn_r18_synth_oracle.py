# Oracle upper bound for the synthetic shapes benchmark: same model/schedule
# as DAF and source-only, trained supervised on labeled FOGGY target images
# (the reference's oracle configs, da_configs/_base_/datasets/oracle.py role).
# Completes the standard three-row UDAOD table: source-only / DA / oracle.
_base_ = ['faster_rcnn_r18_synth_shapes.py']
model = dict(type='FasterRCNN')
data = dict(train=dict(_delete_=True, type='DADataset',
                       ann_file='/tmp/synth_da/shapes_foggy/ImageSets/Main/train.txt',
                       img_prefix='/tmp/synth_da/shapes_foggy/',
                       classes=('square', 'circle'), domain='source',
                       pipeline=[
                           dict(type='LoadImageFromFile'),
                           dict(type='LoadAnnotations', with_bbox=True),
                           dict(type='Resize', img_scale=(192, 128), keep_ratio=True),
                           dict(type='RandomFlip', flip_ratio=0.5),
                           dict(type='Normalize'),
                           dict(type='Pad', size=(128, 192)),
                           dict(type='PackDetInputs', max_gt=10),
                       ]))
