# Trunk learning-efficacy config: FasterRCNNFPN with a swappable backbone
# trained on the synthetic shapes SOURCE split, evaluated on the CLEAR
# test split — the trunk-zoo wave companion to `synth_zoo_smoke.py`
# (which sweeps detector families at fixed trunk). Select the trunk with
# --cfg-options 'model.backbone_cfg.type=HRNet' etc.; RESULTS.md records
# the measured AP50 per trunk. Reference counterparts:
# configs/hrnet/faster_rcnn_hrnetv2p_w18_1x_coco.py,
# configs/pvt/retinanet_pvt-t_fpn_1x_coco.py, configs/res2net, configs/
# regnet, configs/resnest.
_base_ = ['synth_zoo_smoke.py']
model = dict(_delete_=True, type='FasterRCNNFPN', num_classes=2,
             frozen_stages=-1,
             backbone_cfg=dict(type='HRNet', base_width=18))
optimizer = dict(lr=0.01)
runner = dict(max_epochs=15)
evaluation = dict(interval=5, metric='mAP')
lr_config = dict(step=[12])
