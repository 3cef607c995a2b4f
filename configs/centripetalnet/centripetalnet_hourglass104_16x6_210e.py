# reference configs/centripetalnet/centripetalnet_hourglass104_
# mstest_16x6_210e_coco.py
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CentripetalNet', num_classes=80)
optimizer = dict(type='Adam', lr=0.0005)
lr_config = dict(policy='step', step=[190])
runner = dict(type='EpochBasedRunner', max_epochs=210)
