# Trunk-wave row: PVT-tiny under FasterRCNNFPN (VERDICT r3 item 4).
_base_ = ['synth_trunk_smoke.py']
model = dict(backbone_cfg=dict(_delete_=True, type='PVT'))
optimizer = dict(_delete_=True, type='AdamW', lr=0.0002,
                 weight_decay=0.0001)
