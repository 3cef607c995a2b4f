# Supervised tiny smoke: plain Faster R-CNN on the source fixtures
# (overfit check: the stack must reach nonzero mAP on its train set).
_base_ = ['../da/faster_rcnn_r18_tiny_fixture.py']
model = dict(type='FasterRCNN')
data = dict(
    train=dict(_delete_=True, type='DADataset',
               ann_file='tests/data/voc_source/ImageSets/Main/train.txt',
               img_prefix='tests/data/voc_source/', classes=('car', 'person'),
               domain='source',
               pipeline=[
                   dict(type='LoadImageFromFile'),
                   dict(type='LoadAnnotations', with_bbox=True),
                   dict(type='Resize', img_scale=(96, 64), keep_ratio=True),
                   dict(type='Normalize'),
                   dict(type='Pad', size=(64, 96)),
                   dict(type='PackDetInputs', max_gt=10),
               ]),
    val=dict(ann_file='tests/data/voc_source/ImageSets/Main/train.txt',
             img_prefix='tests/data/voc_source/', domain='source'),
    test=dict(ann_file='tests/data/voc_source/ImageSets/Main/train.txt',
              img_prefix='tests/data/voc_source/', domain='source'))
optimizer = dict(lr=0.005)
lr_config = dict(warmup_iters=30, step=[90])
runner = dict(max_epochs=100)
evaluation = dict(interval=25)
