# Counterpart of reference configs/pisa/pisa_ssd300_coco.py —
# ISR-P + CARL on the VGG-16 SSD300 (detectors/pisa.py PISASSD).
_base_ = ['../ssd/ssd300.py']
model = dict(type='PISASSD')
