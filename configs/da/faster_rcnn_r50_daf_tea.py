# DAF on the single-class "tea" pair (reference da_configs/_base_/datasets/
# tea.py; the reference DA_Dataset hardcodes CLASSES=('tea',)).
_base_ = [
    '../_base_/models/faster_rcnn_r50_daf.py',
    '../_base_/datasets/tea.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=1)))
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
ema = dict(momentum=0.9995)
