# DCN-trunk learning-efficacy smoke: FasterRCNN-FPN R50 with DCNv2 stages
# c3-c5 (the configs/dcn family's trunk option) on the synthetic shapes
# source split — RESULTS.md evidence that the deformable path trains.
_base_ = ['synth_zoo_smoke.py']
model = dict(
    _delete_=True, type='FasterRCNNFPN', num_classes=2, frozen_stages=-1,
    backbone_cfg=dict(type='ResNet', depth=50, frozen_stages=-1,
                      dcn=dict(type='DCNv2', deform_groups=1,
                               fallback_on_stride=False),
                      stage_with_dcn=(False, True, True, True)))
