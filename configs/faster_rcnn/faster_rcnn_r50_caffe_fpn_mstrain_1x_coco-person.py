# Counterpart of reference configs/faster_rcnn/
# faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person.py (single-class person
# detector; dataset `classes=` subset filters annotations to those names).
_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x.py']
classes = ('person', )
model = dict(num_classes=1)
data = dict(train=dict(classes=classes), val=dict(classes=classes),
            test=dict(classes=classes))
