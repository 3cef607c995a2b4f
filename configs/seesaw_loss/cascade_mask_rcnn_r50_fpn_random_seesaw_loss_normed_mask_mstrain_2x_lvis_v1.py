# Counterpart of reference configs/seesaw_loss/cascade_mask_rcnn_r50_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py
_base_ = ['mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py']
model = dict(_delete_=True, type='CascadeMaskRCNN', num_classes=1203,
             loss_cls='seesaw', normed_mask=True)
