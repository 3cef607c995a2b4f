# Counterpart of reference configs/strong_baselines/mask_rcnn_r50_caffe_fpn_syncbn-all_rpn-2conv_lsj_100e_coco.py
# (large-scale-jitter recipe; syncbn tokens are n/a under one SPMD
# program — docs/PARITY.md)
# caffe row: caffe img_norm constants (see gen_config_variants.py note)
_base_ = ['./mask_rcnn_r50_fpn_gn-all_lsj_50e.py']
lr_config = dict(step=[88, 96])
runner = dict(max_epochs=100)
