# Flagship: DAF (CBAM) Cityscapes → FoggyCityscapes
# (reference da_configs/faster_rcnn/faster_rcnn_r50_daf_c2f.py)
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/c2foggy.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=8)))

# Stabilization (validated on the synthetic DA benchmark, RESULTS.md r02):
# grad-clip prevents adversarial-game NaN blowups on long schedules; EMA
# weights are used for eval. The NaN-guard step is on by default for DA
# detectors (apis/train.py).
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
ema = dict(momentum=0.9995)
