# CornerNet learning-efficacy row (VERDICT r4 item 4; reference
# configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py,
# shrunk hourglass for the 128x192 synth canvas). Corner nets train with
# Adam in the reference (lr 2.5e-4).
_base_ = ['synth_zoo_smoke.py']
model = dict(_delete_=True, type='CornerNet', num_classes=2,
             downsample_times=4,
             stage_channels=[64, 64, 96, 96, 128],
             stage_blocks=[1, 1, 1, 1, 2], num_stacks=2, corner_topk=50)
optimizer = dict(_delete_=True, type='Adam', lr=0.00025)
runner = dict(max_epochs=30)
lr_config = dict(step=[25])
