# Source-only control for the synthetic shapes benchmark: same model/schedule,
# trained on CLEAR source images only (the reference's source_only configs,
# da_configs/_base_/datasets/*source_only*).
_base_ = ['faster_rcnn_r18_synth_shapes.py']
model = dict(type='FasterRCNN')
data = dict(train=dict(_delete_=True, type='DADataset',
                       ann_file='/tmp/synth_da/shapes_clear/ImageSets/Main/train.txt',
                       img_prefix='/tmp/synth_da/shapes_clear/',
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
