# CyCADA: CycleGAN translation pretraining phase
# (reference da_configs/_base_/models/faster_rcnn_r50_torch_cycada.py)
_base_ = ['faster_rcnn_r50_daf_c2f.py']
model = dict(type='CyCADA')
