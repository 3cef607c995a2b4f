# reference configs/_base_/datasets/lvis_v0.5_instance.py
_base_ = ['./lvis_v1_instance.py']
data_root = 'data/lvis_v0.5/'
data = dict(
    train=dict(dataset=dict(
        type='LVISV05Dataset',
        ann_file=data_root + 'annotations/lvis_v0.5_train.json',
        img_prefix=data_root + 'train2017/')),
    val=dict(type='LVISV05Dataset',
             ann_file=data_root + 'annotations/lvis_v0.5_val.json',
             img_prefix=data_root + 'val2017/'),
    test=dict(type='LVISV05Dataset',
              ann_file=data_root + 'annotations/lvis_v0.5_val.json',
              img_prefix=data_root + 'val2017/'))
