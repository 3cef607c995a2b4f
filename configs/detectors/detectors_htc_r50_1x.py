# reference configs/detectors/detectors_htc_r50_1x_coco.py —
# HTC + recursive feature pyramid + switchable atrous conv.
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DetectoRSHTC', backbone_depth=50, num_classes=80)
