# Counterpart of reference configs/htc/htc_without_semantic_r50_fpn_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['htc_r50_fpn_1x.py']
