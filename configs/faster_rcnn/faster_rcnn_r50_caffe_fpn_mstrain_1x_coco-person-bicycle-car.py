# Counterpart of reference configs/faster_rcnn/
# faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person-bicycle-car.py.
_base_ = ['faster_rcnn_r50_caffe_fpn_mstrain_1x.py']
classes = ('person', 'bicycle', 'car')
model = dict(num_classes=3)
data = dict(train=dict(classes=classes), val=dict(classes=classes),
            test=dict(classes=classes))
