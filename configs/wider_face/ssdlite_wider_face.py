# reference configs/wider_face/ssd300_wider_face.py (SSD family; the
# TPU zoo's SSD variant is SSDLite — MobileNetV2 trunk, same SSD head
# geometry; docs/PARITY.md).
_base_ = [
    '../_base_/datasets/wider_face.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SSDLite', num_classes=1)
optimizer = dict(type='SGD', lr=0.012, momentum=0.9, weight_decay=5e-4)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=0.001, step=[16, 20])
runner = dict(type='EpochBasedRunner', max_epochs=24)
