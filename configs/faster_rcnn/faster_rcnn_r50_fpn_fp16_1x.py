# Counterpart of reference configs/faster_rcnn/faster_rcnn_r50_fpn_fp16_1x_coco.py
# (variant row emitted by tools/misc/gen_config_variants.py).
_base_ = ['faster_rcnn_r50_fpn_1x.py']
# reference fp16 -> bf16 compute on TPU (apis/train.py fp16 gate)
fp16 = dict(loss_scale=512.)
