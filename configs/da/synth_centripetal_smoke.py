# CentripetalNet learning-efficacy row (VERDICT r4 item 4; reference
# configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py).
_base_ = ['synth_cornernet_smoke.py']
model = dict(type='CentripetalNet')  # inherits the cornernet smoke's shrunk hourglass
