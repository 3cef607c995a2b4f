# PAA teacher for the LAD row (reference configs/lad/ uses a pretrained
# PAA-R50 teacher; here a PAA-R18 trained on the same synth split).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='PAA')
checkpoint_config = dict(interval=15)
