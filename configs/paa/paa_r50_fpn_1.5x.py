# Counterpart of reference configs/paa/paa_r50_fpn_1.5x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['paa_r50_fpn_1x.py']
lr_config = dict(step=[12, 16])
runner = dict(max_epochs=18)
