# Zoo learning-efficacy config: train any single-stage detector on the
# synthetic shapes SOURCE split and evaluate on the CLEAR test split —
# used by RESULTS.md to demonstrate zoo detectors learn end-to-end.
# Select the family with --cfg-options model.type=FCOS etc.
_base_ = ['faster_rcnn_r18_synth_source_only.py']
model = dict(_delete_=True, type='FCOS', backbone_depth=18, num_classes=2,
             frozen_stages=-1)
data = dict(
    val=dict(_delete_=True, type='DADataset',
             ann_file='/tmp/synth_da/shapes_clear/ImageSets/Main/test.txt',
             img_prefix='/tmp/synth_da/shapes_clear/',
             classes=('square', 'circle'), domain='source',
             pipeline=[
                 dict(type='MultiScaleFlipAug', img_scale=(192, 128),
                      flip=False,
                      transforms=[
                          dict(type='LoadImageFromFile'),
                          dict(type='Resize', img_scale=(192, 128),
                               keep_ratio=True),
                          dict(type='Normalize'),
                          dict(type='Pad', size=(128, 192)),
                          dict(type='PackDetInputs', max_gt=10),
                      ])]))
optimizer = dict(lr=0.01)
runner = dict(max_epochs=15)
evaluation = dict(interval=5, metric='mAP')
lr_config = dict(step=[12])
