# Trunk-wave row: Res2Net under FasterRCNNFPN on the synth shapes split
# (VERDICT r3 item 4). _delete_ replaces the whole backbone_cfg so no
# base keys leak across trunks.
_base_ = ['synth_trunk_smoke.py']
model = dict(backbone_cfg=dict(_delete_=True, type='Res2Net', depth=50))
