# GCNet-plugin learning-efficacy smoke: FasterRCNN-FPN R50 with
# ContextBlock r4 on c3-c5 (the configs/gcnet family's trunk option) on
# the synthetic shapes source split.
_base_ = ['synth_zoo_smoke.py']
model = dict(
    _delete_=True, type='FasterRCNNFPN', num_classes=2, frozen_stages=-1,
    backbone_cfg=dict(type='ResNet', depth=50, frozen_stages=-1,
                      plugins=[dict(cfg=dict(type='ContextBlock',
                                             ratio=1. / 4),
                                    stages=(False, True, True, True),
                                    position='after_conv3')]))
