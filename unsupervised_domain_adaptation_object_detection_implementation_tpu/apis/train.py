"""Training loop (reference `mmdet/apis/train.py:71` train_detector +
`tools/DA_train.py:184` DA flow, without the runner/hook machinery).

The loop is thin by design: data iteration, the jitted train step, periodic
logging (JSON lines, the reference's `.log.json` equivalent), epoch-end
evaluation (`EvalHook`), and orbax checkpoints (`CheckpointHook`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data import DataLoader, build_dataset
from ..models.builder import build_detector
from ..parallel import (global_batch_from_host_data, init_multihost,
                        mesh_from_cfg, replicate_state, shard_batch,
                        shard_train_state)
from ..utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                load_pretrained_backbone, save_checkpoint)
from .test import evaluate_dataset
from .train_state import (OptimizerSpec, create_train_state, make_train_step)


def init_random_seed(seed: Optional[int]) -> int:
    return int(seed) if seed is not None else int(time.time()) % 2**31


def resolve_runner(runner_cfg, lr_cfg, steps_per_epoch: int,
                   max_epochs: Optional[int] = None):
    """Resolve the runner block into loop bounds + step-unit lr milestones.

    EpochBasedRunner (default): `max_epochs` epochs, `lr_config.step` in
    EPOCHS. IterBasedRunner (reference
    `configs/retinanet/retinanet_r50_fpn_90k_coco.py:12`): `max_iters`
    optimizer steps, `lr_config.step` (and eval/checkpoint intervals,
    handled by the loop) in ITERS.

    Returns (iter_based, epochs, max_iters_or_None, milestones).
    """
    iter_based = 'Iter' in str(runner_cfg.get('type', ''))
    if iter_based:
        max_iters = int(runner_cfg.get('max_iters', 90000))
        epochs = -(-max_iters // max(steps_per_epoch, 1))
    else:
        max_iters = None
        epochs = max_epochs or runner_cfg.get('max_epochs', 12)
    step_cfg = lr_cfg.get('step', [])
    if isinstance(step_cfg, (int, float)):
        step_cfg = [step_cfg]
    milestones = tuple(int(m) * (1 if iter_based else steps_per_epoch)
                       for m in step_cfg)
    return iter_based, epochs, max_iters, milestones


def train_detector(cfg, work_dir: str, resume_from: Optional[str] = None,
                   load_from: Optional[str] = None,
                   pretrained_backbone: Optional[str] = None,
                   seed: int = 0, log_interval: int = 50,
                   max_epochs: Optional[int] = None,
                   eval_interval: int = 1,
                   checkpoint_interval: int = 1,
                   n_devices: Optional[int] = None,
                   launcher: Optional[str] = None) -> Dict[str, float]:
    """Config-driven training. Returns the last eval metrics.

    `launcher='jax'` (or a `dist_params` config block) initializes the
    multi-process runtime via `jax.distributed.initialize` — the reference's
    `init_dist(args.launcher)` (`tools/DA_train.py:66-70,214`). Each host
    then feeds its slice of the global batch
    (`jax.make_array_from_process_local_data`). A `mesh = dict(data=-1,
    model=k)` config block adds tensor parallelism (Megatron bbox-head
    split, `parallel/shardings.py`).
    """
    if launcher == 'jax' or cfg.get('dist_params'):
        dp = cfg.get('dist_params') or {}
        init_multihost(coordinator_address=dp.get('coordinator_address'),
                       num_processes=dp.get('num_processes'),
                       process_id=dp.get('process_id'))
    os.makedirs(work_dir, exist_ok=True)
    log_path = os.path.join(work_dir, 'train_log.jsonl')

    # reference `fp16 = dict(loss_scale=…)` config block → bf16 compute
    # path (no loss scaling needed: bf16 shares fp32's exponent range)
    model_cfg = dict(cfg.model)
    if cfg.get('fp16') is not None and 'dtype' not in model_cfg:
        import jax.numpy as jnp
        model_cfg['dtype'] = jnp.bfloat16
    model = build_detector(model_cfg)
    train_ds = build_dataset(cfg.data['train'])
    # reference NumClassCheckHook: the head's num_classes must match the
    # dataset's CLASSES (a silent mismatch trains a wrong-width head)
    ds_classes = getattr(train_ds, 'CLASSES', None)
    model_nc = getattr(model, 'num_classes', None)
    if ds_classes and model_nc is not None and len(ds_classes) != model_nc:
        import warnings
        warnings.warn(
            f'model.num_classes={model_nc} != len(dataset.CLASSES)='
            f'{len(ds_classes)} ({ds_classes[:5]}…) — check the config '
            f'(reference NumClassCheckHook)')
    samples_per_batch = cfg.data.get('samples_per_gpu', 2)
    mesh = mesh_from_cfg(cfg, n_devices)
    tp = mesh.shape.get('model', 1)
    n_dev = mesh.devices.size
    # batch rows ride the `data` axis only; TP replicas share rows
    global_batch = samples_per_batch * (n_dev // tp)
    n_proc = jax.process_count()
    proc_id = jax.process_index()
    if global_batch % max(n_proc, 1):
        raise ValueError(f'global batch {global_batch} not divisible by '
                         f'{n_proc} processes')
    # every host walks the SAME deterministic global sampler and takes its
    # contiguous row slice — replaces the reference's DistributedSampler
    # (contiguity keeps the two-stream [s,t,s,t,…] interleave intact as
    # long as the per-host share is even)
    loader = DataLoader(train_ds, global_batch, seed=seed)
    per_host = global_batch // n_proc
    host_lo, host_hi = proc_id * per_host, (proc_id + 1) * per_host

    def put_batch(batch):
        if n_proc == 1:
            return shard_batch(batch, mesh)
        local = {k: v[host_lo:host_hi] for k, v in batch.items()}
        return global_batch_from_host_data(local, mesh)

    # optimizer spec from cfg
    opt_cfg = cfg.get('optimizer', {})
    lr_cfg = cfg.get('lr_config', {}) or {}
    runner_cfg = cfg.get('runner', {}) or {}
    eval_interval = (cfg.get('evaluation', {}) or {}).get(
        'interval', eval_interval)
    checkpoint_interval = (cfg.get('checkpoint_config', {}) or {}).get(
        'interval', checkpoint_interval)
    steps_per_epoch = len(loader)
    iter_based, epochs, max_iters, milestones = resolve_runner(
        runner_cfg, lr_cfg, steps_per_epoch, max_epochs)
    grad_clip = (cfg.get('optimizer_config', {}) or {}).get(
        'grad_clip', None)
    if isinstance(grad_clip, dict):
        # mmdet form: dict(max_norm=35, norm_type=2)
        grad_clip = grad_clip.get('max_norm')
    # lr policy: mmcv names 'step' / 'CosineAnnealing' / 'YOLOX'
    policy = str(lr_cfg.get('policy', 'step')).lower()
    warmup_iters = lr_cfg.get('warmup_iters', 500)
    if lr_cfg.get('warmup_by_epoch'):
        warmup_iters = int(warmup_iters) * steps_per_epoch
    min_lr_ratio = lr_cfg.get('min_lr_ratio')
    if min_lr_ratio is None:
        base_lr = opt_cfg.get('lr', 1e-3)
        min_lr_ratio = lr_cfg.get('min_lr', 0.0) / base_lr if base_lr else 0.0
    spec = OptimizerSpec(
        lr=opt_cfg.get('lr', 1e-3),
        momentum=opt_cfg.get('momentum', 0.9),
        weight_decay=opt_cfg.get('weight_decay', 5e-4),
        warmup_iters=warmup_iters,
        warmup_ratio=lr_cfg.get('warmup_ratio', 1e-4),
        decay_steps=milestones,
        policy=policy,
        warmup=str(lr_cfg.get('warmup', 'linear') or 'constant').lower(),
        total_steps=max_iters or epochs * steps_per_epoch,
        min_lr_ratio=float(min_lr_ratio),
        fixed_last_steps=int(lr_cfg.get('num_last_epochs', 0))
        * steps_per_epoch,
        grad_clip=grad_clip,
        opt_type=str(opt_cfg.get('type', 'SGD')).lower(),
        paramwise=opt_cfg.get('paramwise_cfg'))

    # init
    rng = jax.random.PRNGKey(seed)
    sample_batch = next(iter(loader))
    import jax.numpy as jnp
    jb = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    variables = model.init({'params': rng, 'sampler': rng, 'dropout': rng},
                           jb, train=True)
    if pretrained_backbone:
        variables = load_pretrained_backbone(variables, pretrained_backbone)
    frozen = cfg.model.get('backbone', {}).get('frozen_stages', 1) \
        if hasattr(cfg.model, 'get') else 1
    # EMA: `custom_hooks=[dict(type='ExpMomentumEMAHook', momentum=m)]`
    # (reference `core/hook/ema.py:104`; mmcv convention m≈2e-4 is the NEW
    # weight's coefficient — ours is the decay, hence 1-m) or a native
    # `ema=dict(momentum=0.9998)` block.
    ema_momentum = None
    for hook in (cfg.get('custom_hooks', []) or []):
        if 'EMA' in str(hook.get('type', '')):
            ema_momentum = 1.0 - hook.get('momentum', 2e-4)
    if cfg.get('ema'):
        ema_momentum = cfg['ema'].get('momentum', 0.9998)

    from ..models.detectors.cyda_faster_rcnn import CyDAFasterRCNN
    is_gan = isinstance(model, CyDAFasterRCNN)
    if is_gan:
        from .train_state import create_gan_train_state, make_gan_train_step
        state, tx_main, tx_disc = create_gan_train_state(
            model, variables, spec, frozen_stages=frozen)
        step_builder = lambda: make_gan_train_step(model, tx_main, tx_disc)  # noqa: E731
    else:
        state, tx = create_train_state(model, variables, spec,
                                       frozen_stages=frozen,
                                       ema=ema_momentum is not None)
        # NaN-guard (reference `CheckInvalidLossHook`): skip nonfinite
        # updates; on by default for adversarial (DA) models whose GRL
        # game can spike late in training (RESULTS.md r01/r02)
        _adversarial = {'DAFasterRCNN', 'DAFasterRCNN_Org', 'MAFasterRCNN',
                        'FasterRCNN_SWDA', 'DAFasterRCNN_Deep',
                        'DAFasterRCNN_Tri', 'CyDAFasterRCNN', 'CyCADA'}
        model_type = cfg.model.get('type', '') \
            if hasattr(cfg.model, 'get') else ''
        nan_guard = bool((cfg.get('optimizer_config', {}) or {}).get(
            'nan_guard', model_type in _adversarial))
        step_builder = lambda: make_train_step(  # noqa: E731
            model, tx, skip_nonfinite=nan_guard,
            ema_momentum=ema_momentum)

    start_epoch = 0
    if resume_from:
        path = latest_checkpoint(work_dir) if resume_from == 'auto' \
            else resume_from
        if path:
            restored = load_checkpoint(path, jax.device_get(state))
            state = jax.tree_util.tree_map(jnp.asarray, restored)
            start_epoch = int(state.step) // max(steps_per_epoch, 1)
            print(f'[train] resumed from {path} (epoch {start_epoch})')
    elif load_from:
        restored = load_checkpoint(load_from, jax.device_get(state))
        state = state._replace(params=restored.params,
                               batch_stats=restored.batch_stats)
        print(f'[train] loaded weights from {load_from}')

    # `load_submodule = dict(teacher='/path/to/donor_ckpt')` config block:
    # graft a donor checkpoint's params under one submodule key — the
    # reference's pretrained-teacher loading for distillation rows
    # (configs/lad/* `load_pretrained_teacher`, configs/ld/* teacher_ckpt).
    for sub_key, donor_path in (cfg.get('load_submodule') or {}).items():
        donor = load_checkpoint(donor_path)     # raw dict tree
        donor_params = donor['params'] if 'params' in donor else donor
        params = dict(state.params)
        tmpl = params.get(sub_key)
        if tmpl is not None:
            t_leaves = len(jax.tree_util.tree_leaves(tmpl))
            d_leaves = len(jax.tree_util.tree_leaves(donor_params))
            if t_leaves != d_leaves:
                raise ValueError(
                    f'load_submodule[{sub_key}]: donor has {d_leaves} '
                    f'param leaves, submodule expects {t_leaves}')
        import jax.numpy as _jnp
        params[sub_key] = jax.tree_util.tree_map(_jnp.asarray, donor_params)
        state = state._replace(params=type(state.params)(params)
                               if not isinstance(state.params, dict)
                               else params)
        print(f'[train] grafted {donor_path} into params[{sub_key!r}]')

    step_fn = jax.jit(step_builder(), donate_argnums=0)

    def state_to_host(s):
        if n_proc > 1:
            from jax.experimental import multihost_utils
            return multihost_utils.process_allgather(s)
        return jax.device_get(s)

    with mesh:
        state = shard_train_state(state, mesh) if tp > 1 \
            else replicate_state(state, mesh)
        metrics_out: Dict[str, float] = {}
        log_f = open(log_path, 'a')
        # rbg keys: dropout/sampler bits come from XLA RngBitGenerator
        # instead of threefry lane arithmetic — measured 4.5 ms/step cheaper
        # on v5e at the flagship bench shapes (step_ablation.py). fold_in/
        # split semantics are unchanged; set `prng_impl='threefry2x32'` in
        # the config to reproduce old streams bit-for-bit.
        step_rng = jax.random.key(seed + 1,
                                  impl=str(cfg.get('prng_impl', 'rbg')))
        # YOLOX mode switch: `custom_hooks=[dict(type='YOLOXModeSwitchHook',
        # num_last_epochs=15)]` (reference `yolox_mode_switch_hook.py`)
        switch_at = None
        for hook in (cfg.get('custom_hooks', []) or []):
            if 'ModeSwitch' in str(hook.get('type', '')):
                switch_at = epochs - hook.get('num_last_epochs', 15)
        def do_ckpt(tag: int):
            host_state = state_to_host(state)
            if proc_id != 0:
                return
            save_checkpoint(
                os.path.join(work_dir, f'ckpt_{tag}'),
                host_state,
                meta=dict(epoch=tag, classes=list(
                    getattr(train_ds, 'CLASSES', []))))

        def do_eval(tag_key: str, tag: int):
            nonlocal metrics_out
            if not hasattr(train_detector, '_val_cache') or \
                    train_detector._val_cache[0] is not cfg:
                train_detector._val_cache = (
                    cfg, build_dataset(cfg.data['val']))
            val_ds = train_detector._val_cache[1]
            # evaluate with EMA weights when tracking them (EMAHook
            # swaps model↔ema around eval the same way)
            eval_params = state.ema_params if state.ema_params is not None \
                else state.params
            metrics_out = evaluate_dataset(
                model, {'params': eval_params,
                        'batch_stats': state.batch_stats},
                val_ds, samples_per_batch=global_batch, mesh=mesh)
            rec = dict(mode='val', **{tag_key: tag},
                       **{k: round(float(v), 4)
                          for k, v in metrics_out.items()})
            print(f'[eval] {rec}')
            log_f.write(json.dumps(rec) + '\n')
            log_f.flush()

        done = False
        for epoch in range(start_epoch, epochs):
            if switch_at is not None and epoch >= switch_at and \
                    hasattr(loader.dataset, 'disable_mix'):
                loader.dataset.disable_mix()
                switch_at = None
                print('[train] YOLOX mode switch: mix augs disabled')
            t_epoch = time.time()
            for it, batch in enumerate(loader):
                sb = shard_batch(batch, mesh)
                state, metrics = step_fn(state, sb, step_rng)
                g_it = epoch * steps_per_epoch + it + 1
                if (it + 1) % log_interval == 0 or it + 1 == steps_per_epoch:
                    m = {k: float(v) for k, v in
                         jax.device_get(metrics).items()}
                    rec = dict(mode='train', epoch=epoch + 1, iter=it + 1,
                               **{k: round(v, 5) for k, v in m.items()})
                    print(f'[train] {rec}')
                    log_f.write(json.dumps(rec) + '\n')
                    log_f.flush()
                if iter_based:
                    done = g_it >= max_iters
                    if g_it % checkpoint_interval == 0 or done:
                        do_ckpt(g_it)
                    if 'val' in cfg.data and (g_it % eval_interval == 0
                                              or done):
                        do_eval('iter', g_it)
                    if done:
                        break
            print(f'[train] epoch {epoch + 1} done in '
                  f'{time.time() - t_epoch:.1f}s')
            if done:
                break
            if iter_based:
                continue
            if (epoch + 1) % checkpoint_interval == 0 or epoch + 1 == epochs:
                do_ckpt(epoch + 1)
            if 'val' in cfg.data and (epoch + 1) % eval_interval == 0:
                do_eval('epoch', epoch + 1)
        log_f.close()
    return metrics_out
