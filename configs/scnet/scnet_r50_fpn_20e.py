# Counterpart of reference configs/scnet/scnet_r50_fpn_20e_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['scnet_r50_fpn_1x.py']
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
