"""Benchmark: DA Faster R-CNN R50 training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's fps benchmark
(`tools/analysis_tools/benchmark.py:101-132`: warmup then timed steps,
device-synchronized) applied to the flagship DA train step (full adversarial
loss + SGD update) at the Cityscapes→Foggy canvas (512×1024 after
keep-ratio resize to (1000,600) and ÷32 padding).

`vs_baseline` compares against a PyTorch-CPU proxy of the same workload
(R50-DC5 forward+backward, the FLOP-dominant part), measured once and cached
in `.bench_baseline.json` — the reference itself cannot run here (no CUDA,
no mmcv), so the north-star "≥5× PyTorch-CPU images/sec/chip"
(BASELINE.json) is evaluated against that measured proxy.
"""

import json
import os
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              '.bench_baseline.json')
H, W = 512, 1024
BATCH = int(os.environ.get('BENCH_BATCH', 8))  # protocol default: 8


def measure_torch_cpu_baseline(max_iters: int = 3) -> float:
    """images/sec of a torch-CPU R50-DC5 trunk fwd+bwd at the bench shape."""
    import torch
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride=1, dilation=1):
            super().__init__()
            cout = planes * 4
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation,
                                   dilation, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout)) if (stride != 1 or cin != cout) else None
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            idt = self.down(x) if self.down else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    def stage(cin, planes, blocks, stride, dilation):
        layers = [Bottleneck(cin, planes, stride, dilation)]
        layers += [Bottleneck(planes * 4, planes, 1, dilation)
                   for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    model = nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
        nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1),
        stage(64, 64, 3, 1, 1), stage(256, 128, 4, 2, 1),
        stage(512, 256, 6, 2, 1), stage(1024, 512, 3, 1, 2))
    x = torch.randn(2, 3, H, W)
    model(x[:1]).sum().backward()  # warmup
    n, t0 = 0, time.perf_counter()
    for _ in range(max_iters):
        model(x).sum().backward()
        n += x.shape[0]
    return n / (time.perf_counter() - t0)


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)['torch_cpu_images_per_sec']
    val = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, 'w') as f:
        json.dump({'torch_cpu_images_per_sec': val}, f)
    return val


def _peak_flops_per_sec(device) -> float:
    """bf16 peak of the bench chip, for MFU accounting."""
    kind = getattr(device, 'device_kind', '').lower()
    table = {
        'v5 lite': 197e12, 'v5e': 197e12,
        'v5p': 459e12, 'v5': 459e12,
        'v4': 275e12, 'v6': 918e12, 'trillium': 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12   # assume v5e


def main():
    import jax
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.models import (
        DAFasterRCNN)
    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
        OptimizerSpec, create_train_state, make_train_step)
    from __graft_entry__ import _demo_batch

    import jax.numpy as jnp
    model = DAFasterRCNN(variant='daf', num_classes=8, backbone_depth=50,
                         dtype=jnp.bfloat16)
    batch = _demo_batch(b=BATCH, h=H, w=W)
    k = jax.random.PRNGKey(0)
    # eval_shape + zeros: model.init would EXECUTE the full forward eagerly,
    # op-by-op over the axon tunnel — minutes of round trips. Throughput does
    # not depend on weight values.
    var_shapes = jax.eval_shape(
        lambda: model.init({'params': k, 'sampler': k, 'dropout': k}, batch,
                           train=True))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)
    state, tx = create_train_state(model, variables, OptimizerSpec(),
                                   frozen_stages=1)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.key(1, impl='rbg')  # train.py's default step-rng impl

    # FLOPs of the compiled step (for MFU) — `get_flops.py` uses the same
    # cost_analysis path
    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    step_flops = float(cost.get('flops', 0.0))

    # compile + warmup. NOTE: over the axon tunnel block_until_ready
    # acks before remote execution completes; fetching the loss VALUE is the
    # only reliable synchronization, so the timed region ends on device_get.
    state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))
    for _ in range(2):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(jax.device_get(m['loss']))   # forces the whole chain
    dt = time.perf_counter() - t0
    ips = BATCH * iters / dt

    achieved = step_flops * iters / dt
    mfu = achieved / _peak_flops_per_sec(jax.devices()[0])

    # family rows (VERDICT r3 item 2 / r4 item 3): Faster R-CNN R50-FPN
    # and Mask R-CNN R50-FPN steps, folded into the same single JSON line
    # as fpn_* / mask_* keys
    def family_row(prefix, fmodel, fbatch):
        try:
            fshapes = jax.eval_shape(
                lambda: fmodel.init({'params': k, 'sampler': k,
                                     'dropout': k}, fbatch, train=True))
            fvars = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), fshapes)
            fstate, ftx = create_train_state(fmodel, fvars,
                                             OptimizerSpec(),
                                             frozen_stages=1)
            fstep = jax.jit(make_train_step(fmodel, ftx),
                            donate_argnums=0)
            fcost = fstep.lower(fstate, fbatch, rng).compile() \
                .cost_analysis() or {}
            if isinstance(fcost, (list, tuple)):
                fcost = fcost[0] if fcost else {}
            fflops = float(fcost.get('flops', 0.0))
            fstate, fm = fstep(fstate, fbatch, rng)
            float(jax.device_get(fm['loss']))
            for _ in range(2):
                fstate, fm = fstep(fstate, fbatch, rng)
            float(jax.device_get(fm['loss']))
            t0 = time.perf_counter()
            for _ in range(iters):
                fstate, fm = fstep(fstate, fbatch, rng)
            float(jax.device_get(fm['loss']))
            fdt = time.perf_counter() - t0
            return {
                f'{prefix}_img_s': round(BATCH * iters / fdt, 3),
                f'{prefix}_step_tflops': round(fflops / 1e12, 3),
                f'{prefix}_mfu': round(
                    fflops * iters / fdt
                    / _peak_flops_per_sec(jax.devices()[0]), 4),
            }
        except Exception as e:  # noqa: BLE001 — never lose the main row
            return {f'{prefix}_error': f'{type(e).__name__}: {str(e)[:80]}'}

    fpn = {}
    if not os.environ.get('BENCH_SKIP_FPN'):
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.faster_rcnn_fpn import (  # noqa: E501
            FasterRCNNFPN)
        fpn.update(family_row(
            'fpn', FasterRCNNFPN(num_classes=8, backbone_depth=50,
                                 dtype=jnp.bfloat16), batch))
    if not os.environ.get('BENCH_SKIP_MASK'):
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.detectors.mask_rcnn import (  # noqa: E501
            MaskRCNN)
        g = batch['gt_bboxes'].shape[1]
        mbatch = dict(batch,
                      gt_masks=jnp.zeros((BATCH, g, 28, 28), jnp.float32))
        fpn.update(family_row(
            'mask', MaskRCNN(num_classes=8, backbone_depth=50,
                             dtype=jnp.bfloat16), mbatch))

    baseline = get_baseline()
    print(json.dumps({
        'metric': 'images/sec/chip (DA Faster R-CNN R50 train)',
        'value': round(ips, 3),
        'unit': 'img/s',
        'vs_baseline': round(ips / baseline, 3),
        'step_tflops': round(step_flops / 1e12, 3),
        'achieved_tflops_per_sec': round(achieved / 1e12, 3),
        'mfu': round(mfu, 4),
        **fpn,
    }))


if __name__ == '__main__':
    main()
