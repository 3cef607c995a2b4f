# Faster R-CNN Res2Net-101 FPN (reference
# configs/res2net/faster_rcnn_r2_101_fpn_2x_coco.py) — generic trunk swap
# through model.backbone_cfg (backbones/build.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x.py']
model = dict(backbone_cfg=dict(type='Res2Net', depth=101))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
