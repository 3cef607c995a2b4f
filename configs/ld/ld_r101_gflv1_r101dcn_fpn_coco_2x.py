# Counterpart of reference configs/ld/ld_r101_gflv1_r101dcn_fpn_coco_2x.py
# (teacher trunk DCN provenance is a checkpoint property; the distill
# machinery is depth-101 teacher -> depth-101 student on the 2x schedule)
_base_ = ['./ld_r18_gflv1_r101_1x.py']
model = dict(backbone_depth=101, teacher_depth=101)
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
