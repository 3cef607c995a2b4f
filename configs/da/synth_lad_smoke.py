# LAD learning-efficacy row (VERDICT r4 item 4; reference
# configs/lad/lad_r50_paa_r101_fpn_coco_1x.py — student R18 guided by the
# PAA teacher trained by synth_paa_teacher.py; teacher params are grafted
# by tools/misc/make_lad_init.py and loaded via load_from).
_base_ = ['synth_zoo_smoke.py']
model = dict(type='LAD', teacher_depth=18)
load_submodule = dict(teacher='/tmp/r5_runs/paa_teacher/ckpt_15')
