# DAF on the day→night domain pair (reference
# da_configs/faster_rcnn/DAF_Org_d2n.py family; dataset template d2n.py).
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/d2n.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
ema = dict(momentum=0.9995)
