# reference configs/pisa/pisa_ssd300_coco.py (SSD variant here = SSDLite)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='PISASSDLite', num_classes=80)
optimizer = dict(type='SGD', lr=0.002, momentum=0.9, weight_decay=5e-4)
