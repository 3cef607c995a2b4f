# GN+WS trunk learning-efficacy smoke: FasterRCNN-FPN R50 with
# weight-standardized convs + GroupNorm (the configs/gn+ws family's trunk
# option) on the synthetic shapes source split.
_base_ = ['synth_zoo_smoke.py']
model = dict(
    _delete_=True, type='FasterRCNNFPN', num_classes=2, frozen_stages=-1,
    backbone_cfg=dict(type='ResNet', depth=50, frozen_stages=-1,
                      conv_cfg=dict(type='ConvWS'),
                      norm_cfg=dict(type='GN', num_groups=32,
                                    requires_grad=True)))
