# Counterpart of reference configs/reppoints/reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['reppoints_moment_r50_fpn_1x.py']
