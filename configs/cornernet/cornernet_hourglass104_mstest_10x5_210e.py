# Counterpart of reference configs/cornernet/cornernet_hourglass104_mstest_10x5_210e_coco.py
# — batch-layout row of the CornerNet family (reference rows differ only
# in gpus x samples_per_gpu and the 210-epoch schedule).
_base_ = ['cornernet_hourglass104.py']
data = dict(samples_per_gpu=5)
lr_config = dict(policy='step', step=[180])
runner = dict(type='EpochBasedRunner', max_epochs=210)
