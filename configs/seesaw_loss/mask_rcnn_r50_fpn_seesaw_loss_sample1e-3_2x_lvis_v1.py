# reference configs/seesaw_loss/mask_rcnn_r50_fpn_seesaw_loss_random_
# sample1e-3_mstrain_2x_lvis_v1.py — NormedLinear K+2 head + seesaw CE.
_base_ = [
    '../_base_/datasets/lvis_v1_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskRCNN', num_classes=1203, loss_cls='seesaw')
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[16, 22])
runner = dict(type='EpochBasedRunner', max_epochs=24)
