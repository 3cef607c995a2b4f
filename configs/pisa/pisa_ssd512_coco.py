# Counterpart of reference configs/pisa/pisa_ssd512_coco.py.
_base_ = ['../ssd/ssd512.py']
model = dict(type='PISASSD')
