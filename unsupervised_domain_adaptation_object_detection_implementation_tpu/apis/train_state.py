"""Train state, optimizer, LR schedule and the jitted train step.

Replaces the reference's mmcv runner/hook/optimizer stack
(`apis/train.py:127-203`: SGD build, EpochBasedRunner, LrUpdaterHook,
OptimizerHook) with a single functional train step: forward (all losses) →
grad → SGD update, compiled as ONE XLA program. Parallelism needs no extra
code — with the batch sharded over a `Mesh` data axis and params replicated,
XLA inserts the gradient all-reduce over ICI automatically (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow of `params` (None = EMA disabled). Evaluating with these
    # stabilizes long adversarial runs — reference ships this as
    # `ExpMomentumEMAHook` (`mmdet/core/hook/ema.py:8`); RESULTS.md r01
    # documents the 60-epoch DAF collapse this prevents.
    ema_params: Any = None


class OptimizerSpec(NamedTuple):
    """Reference schedule: SGD lr=1e-3 mom=0.9 wd=5e-4, linear warmup 500
    iters ratio 1e-4, step decay ×0.1 at epoch milestones
    (`da_configs/faster_rcnn/faster_rcnn_r50_daf_c2f.py:7-21`)."""
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    warmup_iters: int = 500
    warmup_ratio: float = 1e-4
    decay_steps: Tuple[int, ...] = ()      # absolute iteration milestones
    decay_factor: float = 0.1
    # lr policy: 'step' (mmcv StepLrUpdaterHook), 'cosine'
    # (CosineAnnealingLrUpdaterHook) or 'yolox'
    # (`mmdet/core/hook/yolox_lrupdater_hook.py:8` — quadratic-exp warmup,
    # cosine anneal, then `num_last_epochs` fixed at the floor).
    policy: str = 'step'
    warmup: str = 'linear'                 # 'linear' | 'exp' | 'constant'
    total_steps: int = 0                   # needed by cosine policies
    min_lr_ratio: float = 0.0              # cosine floor as fraction of lr
    fixed_last_steps: int = 0              # yolox: fixed-lr tail length
    grad_clip: Optional[float] = None
    # 'sgd' | 'adam' | 'adamw' — the reference's DETR-family configs use
    # AdamW (`configs/detr/detr_r50_8x2_150e_coco.py` optimizer type)
    opt_type: str = 'sgd'
    # mmcv DefaultOptimizerConstructor `paramwise_cfg`: per-group lr/decay
    # multipliers — dict(custom_keys={'backbone': dict(lr_mult=0.1)},
    # bias_lr_mult=..., bias_decay_mult=..., norm_decay_mult=...).
    # Reference DETR/Deformable/Swin configs all rely on this
    # (`configs/detr/detr_r50_8x2_150e_coco.py` paramwise_cfg).
    paramwise: Any = None


def make_lr_schedule(spec: OptimizerSpec) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """mmcv LrUpdaterHook semantics as one pure fn of the iteration count.

    - step: linear/exp/constant warmup × milestone decay (the reference's
      default `lr_config=dict(policy='step', warmup='linear', …)`).
    - cosine: `CosineAnnealingLrUpdaterHook` — anneal lr → lr·min_lr_ratio
      over `total_steps`.
    - yolox: `yolox_lrupdater_hook.py:8` — warmup k = ratio·((i+1)/w)²,
      then cosine from lr to the floor over
      (total − warmup − fixed_last_steps), then the floor held fixed.
    """
    policy = spec.policy.lower()

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        floor = spec.lr * spec.min_lr_ratio
        if policy == 'yolox':
            w = max(spec.warmup_iters, 1)
            warm_lr = spec.lr * spec.warmup_ratio * ((step + 1) / w) ** 2
            anneal_span = max(
                spec.total_steps - spec.warmup_iters -
                spec.fixed_last_steps, 1)
            frac = jnp.clip(
                (step + 1 - spec.warmup_iters) / anneal_span, 0.0, 1.0)
            cos_lr = floor + 0.5 * (spec.lr - floor) * \
                (jnp.cos(jnp.pi * frac) + 1)
            regular = jnp.where(
                step + 1 >= spec.total_steps - spec.fixed_last_steps,
                floor, cos_lr)
            return jnp.where(step < spec.warmup_iters, warm_lr, regular)

        if spec.warmup_iters > 0:
            warm_frac = jnp.clip(step / spec.warmup_iters, 0, 1)
            if spec.warmup == 'exp':
                # mmcv: k = warmup_ratio ** (1 - cur/warmup_iters)
                warm = spec.warmup_ratio ** (1 - warm_frac)
            elif spec.warmup == 'constant':
                warm = jnp.where(warm_frac < 1.0, spec.warmup_ratio, 1.0)
            else:
                warm = spec.warmup_ratio + (1 - spec.warmup_ratio) * warm_frac
        else:
            warm = 1.0
        if policy in ('cosine', 'cosineannealing'):
            frac = jnp.clip(step / max(spec.total_steps, 1), 0.0, 1.0)
            regular = floor + 0.5 * (spec.lr - floor) * \
                (jnp.cos(jnp.pi * frac) + 1)
            return warm * regular
        decay = spec.decay_factor ** jnp.sum(
            jnp.asarray([step >= m for m in spec.decay_steps], jnp.float32)) \
            if spec.decay_steps else 1.0
        return spec.lr * warm * decay
    return schedule


def frozen_mask(params, frozen_stages: int, extra_frozen=()) -> Any:
    """True = trainable. Masks the stem + first `frozen_stages` res stages
    (the reference's `_freeze_stages`, e.g. `resnet_da_cbam.py:905-920`) so
    neither gradients nor weight decay touch them."""
    frozen_prefixes = []
    if frozen_stages >= 0:
        frozen_prefixes += ['conv1', 'bn1']
        frozen_prefixes += [f'layer{i}/' for i in range(1, frozen_stages + 1)]
    frozen_prefixes += list(extra_frozen)

    def is_trainable(path) -> bool:
        keys = [k.key for k in path if hasattr(k, 'key')]
        # only match the key DIRECTLY under the trunk module — block-internal
        # conv1/bn1 submodules must not be caught by the stem prefixes
        for i, part in enumerate(keys):
            if part in ('trunk', 'backbone') and i + 1 < len(keys):
                nxt = keys[i + 1]
                if nxt == 'trunk':
                    continue
                if any(nxt == p or nxt.startswith(p)
                       for p in frozen_prefixes):
                    return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_trainable(path), params)


def paramwise_labels(params, pw_cfg) -> Tuple[Any, Dict[str, Tuple[float, float]]]:
    """mmcv `DefaultOptimizerConstructor` paramwise grouping
    (reference mmcv `runner/optimizer/default_constructor.py`): returns a
    label tree over `params` plus `label -> (lr_mult, decay_mult)`.

    Rules, in precedence order per parameter:
    1. `custom_keys` — longest key that is a substring of the dotted param
       path wins; takes `lr_mult`/`decay_mult` (defaults 1.0).
    2. norm-layer params (flax modules with a `scale` leaf and no `kernel`,
       i.e. FrozenBatchNorm/LayerNorm/GroupNorm) get `norm_decay_mult`.
    3. other biases get `bias_lr_mult` / `bias_decay_mult`.
    """
    pw = dict(pw_cfg or {})
    custom = {k: dict(v) for k, v in dict(pw.get('custom_keys', {})).items()}
    custom_sorted = sorted(custom, key=len, reverse=True)
    bias_lr = float(pw.get('bias_lr_mult', 1.0))
    bias_wd = float(pw.get('bias_decay_mult', 1.0))
    norm_wd = float(pw.get('norm_decay_mult', 1.0))

    groups: Dict[Tuple[float, float], str] = {}

    def label_of(lr_m: float, wd_m: float) -> str:
        key = (float(lr_m), float(wd_m))
        if key not in groups:
            groups[key] = f'g{len(groups)}'
        return groups[key]

    def walk(tree, path):
        if not isinstance(tree, (dict, flax.core.FrozenDict)):
            name = '.'.join(path)
            for k in custom_sorted:
                if k in name:
                    return label_of(custom[k].get('lr_mult', 1.0),
                                    custom[k].get('decay_mult', 1.0))
            is_norm = path[-1] in ('scale', 'bias') and \
                'scale' in parent_keys[-1] and 'kernel' not in parent_keys[-1]
            if is_norm:
                return label_of(1.0, norm_wd)
            if path[-1] == 'bias':
                return label_of(bias_lr, bias_wd)
            return label_of(1.0, 1.0)
        parent_keys.append(set(tree.keys()))
        out = {k: walk(v, path + (k,)) for k, v in tree.items()}
        parent_keys.pop()
        return out

    parent_keys = [set()]
    labels = walk(params, ())
    return labels, {v: k for k, v in groups.items()}


class FusedSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: Any


class _FusedSGD:
    """Hand-fused SGD fast path: momentum + coupled weight decay + lr
    schedule + paramwise lr/decay multipliers + frozen mask + optional
    global-norm clip, all applied in ONE pass per parameter leaf.

    Semantically identical to the optax chain
    `clip_by_global_norm? → add_decayed_weights(wd) → sgd(lr, momentum)`
    under `multi_transform` grouping (golden-tested against it in
    `tests/test_core/test_fused_sgd.py`), i.e. to torch.optim.SGD as mmcv
    builds it (reference `apis/train.py:127` + DefaultOptimizerConstructor).
    Why it exists: the optax chain measures 11.5 ms/step on the flagship
    bench (228 M params) vs 9.2 ms fused — each chain stage materializes
    an updates tree that XLA does not always fuse away.

    Exposes the standard `init`/`update` pair (so existing call sites,
    e.g. the GAN two-group step, keep working) plus `fused_apply` which
    folds `apply_updates` into the same pass — `make_train_step` prefers
    it when present.
    """

    def __init__(self, spec: OptimizerSpec, labels, mults):
        self.spec = spec
        self.schedule = make_lr_schedule(spec)
        self.labels = labels          # tree of label strings over params
        self.mults = dict(mults)      # label -> (lr_mult, decay_mult)
        self.mults.setdefault('freeze', (0.0, 0.0))

    def init(self, params) -> FusedSGDState:
        return FusedSGDState(
            jnp.zeros((), jnp.int32),
            jax.tree_util.tree_map(jnp.zeros_like, params))

    def _grad_scale(self, grads):
        if not self.spec.grad_clip:
            return 1.0
        gnorm = optax.global_norm(grads)
        return jnp.minimum(1.0, self.spec.grad_clip /
                           jnp.maximum(gnorm, 1e-12))

    def _step(self, grads, state: FusedSGDState, params, fold_apply: bool):
        lr = self.schedule(state.count)
        s = self._grad_scale(grads)
        mu, wd = self.spec.momentum, self.spec.weight_decay

        def leaf(g, m, p, lab):
            lr_m, wd_m = self.mults[lab]
            if lr_m == 0.0 and wd_m == 0.0:      # frozen
                return (jnp.zeros_like(p) if not fold_apply else p), m
            m_new = mu * m + s * g + (wd * wd_m) * p
            delta = (-lr * lr_m) * m_new
            return (p + delta if fold_apply else delta), m_new

        out = jax.tree_util.tree_map(leaf, grads, state.momentum, params,
                                     self.labels)
        first = jax.tree_util.tree_map(
            lambda x: x[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree_util.tree_map(
            lambda x: x[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return first, FusedSGDState(state.count + 1, new_m)

    def update(self, grads, state: FusedSGDState, params):
        """optax-style: returns (updates, new_state)."""
        return self._step(grads, state, params, fold_apply=False)

    def fused_apply(self, grads, state: FusedSGDState, params):
        """One-pass variant: returns (new_params, new_state)."""
        return self._step(grads, state, params, fold_apply=True)


def make_optimizer(spec: OptimizerSpec, params=None, frozen_stages: int = -1
                   ) -> optax.GradientTransformation:
    schedule = make_lr_schedule(spec)
    kind = spec.opt_type.lower()

    def group_tx(lr_mult: float = 1.0, decay_mult: float = 1.0):
        lr = schedule if lr_mult == 1.0 else \
            (lambda step, m=lr_mult: schedule(step) * m)
        wd = spec.weight_decay * decay_mult
        if kind == 'adamw':
            # decoupled weight decay, matching torch.optim.AdamW
            return optax.adamw(learning_rate=lr, weight_decay=wd)
        if kind == 'adam':
            # torch Adam couples wd as L2 on the gradient (before moments)
            return optax.chain(optax.add_decayed_weights(wd),
                               optax.adam(learning_rate=lr))
        return optax.chain(optax.add_decayed_weights(wd),
                           optax.sgd(learning_rate=lr,
                                     momentum=spec.momentum))

    if kind == 'sgd' and params is not None:
        # fast path: one fused pass (see _FusedSGD docstring); exactly the
        # chain built below, measured ~2.3 ms/step cheaper on the flagship
        if spec.paramwise:
            labels, mults = paramwise_labels(params, spec.paramwise)
        else:
            labels = jax.tree_util.tree_map(lambda _: 'g0', params)
            mults = {'g0': (1.0, 1.0)}
        if frozen_stages >= 0:
            mask = frozen_mask(params, frozen_stages)
            labels = jax.tree_util.tree_map(
                lambda lab, t: lab if t else 'freeze', labels, mask)
        return _FusedSGD(spec, labels, mults)

    chain = []
    if spec.grad_clip:
        # global-norm clip over the WHOLE gradient tree, before any
        # per-group splitting (torch clips the same way: one global norm)
        chain.append(optax.clip_by_global_norm(spec.grad_clip))

    if spec.paramwise and params is None:
        import warnings
        warnings.warn('paramwise_cfg ignored: make_optimizer needs the '
                      'param tree to build groups')
    needs_groups = params is not None and \
        (spec.paramwise or frozen_stages >= 0)
    if needs_groups:
        if spec.paramwise:
            labels, mults = paramwise_labels(params, spec.paramwise)
        else:
            labels = jax.tree_util.tree_map(lambda _: 'g0', params)
            mults = {'g0': (1.0, 1.0)}
        # NOTE: optax.masked would pass the RAW gradient through for
        # non-masked leaves; multi_transform + set_to_zero gives frozen
        # leaves a true zero update.
        if frozen_stages >= 0:
            mask = frozen_mask(params, frozen_stages)
            labels = jax.tree_util.tree_map(
                lambda lab, t: lab if t else 'freeze', labels, mask)
        transforms = {lab: group_tx(*ms) for lab, ms in mults.items()}
        transforms['freeze'] = optax.set_to_zero()
        chain.append(optax.multi_transform(transforms, labels))
    else:
        chain.append(group_tx())
    return optax.chain(*chain)


def create_train_state(model, variables, spec: OptimizerSpec,
                       frozen_stages: int = -1,
                       ema: bool = False) -> Tuple[TrainState,
                                                   optax.GradientTransformation]:
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx = make_optimizer(spec, params, frozen_stages)
    opt_state = tx.init(params)
    ema_params = jax.tree_util.tree_map(jnp.array, params) if ema else None
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      opt_state, ema_params), tx


def make_train_step(model, tx: optax.GradientTransformation,
                    loss_aggregate: str = 'sum',
                    skip_nonfinite: bool = False,
                    ema_momentum: Optional[float] = None) -> Callable:
    """Build the pure (state, batch, rng) → (state, metrics) step.

    The returned function is jit-compatible; under a Mesh with the batch
    sharded on 'data', gradients are automatically psum-reduced by XLA.
    """

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        rng_sampler, rng_dropout = jax.random.split(
            jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, new_vars = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True,
                rngs={'sampler': rng_sampler, 'dropout': rng_dropout},
                mutable=['batch_stats'])
            total = sum(out.values())
            return total, (out, new_vars.get('batch_stats', state.batch_stats))

        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if hasattr(tx, 'fused_apply'):
            new_params, new_opt = tx.fused_apply(grads, state.opt_state,
                                                 state.params)
        else:
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            # CheckInvalidLossHook equivalent: a NaN/Inf step keeps the old
            # params instead of killing the run (apis/hooks.py)
            from .hooks import guard_nonfinite_update
            new_params, skipped = guard_nonfinite_update(
                state.params, new_params, total)
            loss_dict = dict(loss_dict, skipped_nonfinite=skipped.astype(
                jnp.float32))
        new_ema = state.ema_params
        if ema_momentum is not None and state.ema_params is not None:
            from .hooks import ema_update
            new_ema = ema_update(state.ema_params, new_params,
                                 momentum=ema_momentum, step=state.step)
        metrics = dict(loss=total, **loss_dict)
        return TrainState(state.step + 1, new_params, new_stats, new_opt,
                          new_ema), metrics

    return step_fn


# ---- adversarial (two-parameter-group) training ---------------------------

def split_params(params, disc_keys: Tuple[str, ...]):
    """Partition the top-level param dict into (main, disc) subtrees."""
    main = {k: v for k, v in params.items() if k not in disc_keys}
    disc = {k: v for k, v in params.items() if k in disc_keys}
    return main, disc


def make_gan_train_step(model, tx_main: optax.GradientTransformation,
                        tx_disc: optax.GradientTransformation,
                        disc_keys: Tuple[str, ...] = ('disc_s', 'disc_t'),
                        disc_loss_prefix: str = 'disc_'):
    """Train step for CycleGAN-style detectors (CyDA/CyCADA): one jitted
    step, two objectives — generator-side terms update every non-`disc_*`
    parameter, `disc_*`-prefixed loss terms update the discriminators
    (reference trains this with a single optimizer over a .item()-spliced
    graph; here the min-max is explicit). Shared forward subgraphs between
    the two grad computations are CSE'd by XLA inside the single program.

    `state.opt_state` is the tuple (opt_main, opt_disc).
    """

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        rng_sampler, rng_dropout = jax.random.split(
            jax.random.fold_in(rng, state.step))
        opt_main, opt_disc = state.opt_state
        main0, disc0 = split_params(state.params, disc_keys)

        def forward(main_p, disc_p):
            out, new_vars = model.apply(
                {'params': {**main_p, **disc_p},
                 'batch_stats': state.batch_stats},
                batch, train=True,
                rngs={'sampler': rng_sampler, 'dropout': rng_dropout},
                mutable=['batch_stats'])
            return out, new_vars.get('batch_stats', state.batch_stats)

        def g_loss(main_p):
            out, stats = forward(main_p, disc0)
            total = sum(v for k, v in out.items()
                        if not k.startswith(disc_loss_prefix))
            return total, (out, stats)

        def d_loss(disc_p):
            out, _ = forward(main0, disc_p)
            return sum(v for k, v in out.items()
                       if k.startswith(disc_loss_prefix))

        (g_total, (loss_dict, new_stats)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(main0)
        d_total, d_grads = jax.value_and_grad(d_loss)(disc0)

        g_updates, opt_main = tx_main.update(g_grads, opt_main, main0)
        new_main = optax.apply_updates(main0, g_updates)
        d_updates, opt_disc = tx_disc.update(d_grads, opt_disc, disc0)
        new_disc = optax.apply_updates(disc0, d_updates)

        metrics = dict(loss=g_total + d_total, **loss_dict)
        return TrainState(state.step + 1, {**new_main, **new_disc},
                          new_stats, (opt_main, opt_disc)), metrics

    return step_fn


def create_gan_train_state(model, variables, spec_main: OptimizerSpec,
                           spec_disc: Optional[OptimizerSpec] = None,
                           frozen_stages: int = -1,
                           disc_keys: Tuple[str, ...] = ('disc_s', 'disc_t')):
    """TrainState + (tx_main, tx_disc) for adversarial detectors."""
    spec_disc = spec_disc or spec_main
    params = variables['params']
    main, disc = split_params(params, disc_keys)
    tx_main = make_optimizer(spec_main, main, frozen_stages)
    # pass disc params so paramwise_cfg (bias/norm decay mults etc.)
    # applies to the discriminators too, matching the reference's single
    # DefaultOptimizerConstructor over all parameters
    tx_disc = make_optimizer(spec_disc, disc)
    state = TrainState(jnp.zeros((), jnp.int32), params,
                       variables.get('batch_stats', {}),
                       (tx_main.init(main), tx_disc.init(disc)))
    return state, tx_main, tx_disc
