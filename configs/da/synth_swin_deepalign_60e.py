# DeepAlign-Swin-T synth retry at a longer schedule (r5): the 30-ep v2 run
# fixed the anchor starvation (AP50 0 → climbing) but a from-scratch 28M
# Swin-T under half-batch DA supervision needs more steps; same program
# shape as synth_swin_deepalign.py so the compile cache makes this rerun
# ~minutes.
_base_ = ['synth_swin_deepalign.py']
optimizer = dict(lr=0.0003)
lr_config = dict(warmup_iters=500, step=[50])
runner = dict(max_epochs=60)
