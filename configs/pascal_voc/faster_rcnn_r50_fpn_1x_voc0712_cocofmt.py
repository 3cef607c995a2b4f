# Counterpart of reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712-cocofmt.py
# (VOC images with COCO-json annotations, e.g. from
# tools/dataset_converters/voc_to_coco.py)
_base_ = ['./faster_rcnn_r50_fpn_1x_voc0712.py']
data_root = 'data/VOCdevkit/'
data = dict(
    train=dict(_delete_=True, type='CocoDataset',
               ann_file=data_root + 'annotations/voc0712_trainval.json',
               img_prefix=data_root,
               pipeline=[
                   dict(type='LoadImageFromFile'),
                   dict(type='LoadAnnotations', with_bbox=True),
                   dict(type='Resize', img_scale=(1000, 600), keep_ratio=True),
                   dict(type='RandomFlip', flip_ratio=0.5),
                   dict(type='Normalize'),
                   dict(type='Pad', size=(608, 1024)),
                   dict(type='PackDetInputs', max_gt=100),
               ]),
    val=dict(type='CocoDataset',
             ann_file=data_root + 'annotations/voc07_test.json',
             img_prefix=data_root),
    test=dict(type='CocoDataset',
              ann_file=data_root + 'annotations/voc07_test.json',
              img_prefix=data_root))
