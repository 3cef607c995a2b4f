# Empirical-attention plugin efficacy smoke: FasterRCNN-FPN R50 with
# GeneralizedAttention '0010' after conv2 on c4-c5 (the
# configs/empirical_attention family's trunk option).
_base_ = ['synth_zoo_smoke.py']
model = dict(
    _delete_=True, type='FasterRCNNFPN', num_classes=2, frozen_stages=-1,
    backbone_cfg=dict(type='ResNet', depth=50, frozen_stages=-1,
                      plugins=[dict(cfg=dict(type='GeneralizedAttention',
                                             spatial_range=-1, num_heads=8,
                                             attention_type='0010',
                                             kv_stride=2),
                                    stages=(False, False, True, True),
                                    position='after_conv2')]))
