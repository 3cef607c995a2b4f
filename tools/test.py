#!/usr/bin/env python
"""Evaluation CLI (reference `tools/test.py`): checkpoint → dataset metrics."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (  # noqa: E402
    evaluate_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.data import (  # noqa: E402
    build_dataset)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.builder import (  # noqa: E402
    build_detector)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config, load_checkpoint)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.config import (  # noqa: E402
    parse_option_value)


def main(argv=None):
    p = argparse.ArgumentParser(description='Test a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--eval', default='mAP', help='mAP | recall | bbox')
    p.add_argument('--out', default=None, help='save raw results (.pkl)')
    p.add_argument('--show-dir', default=None,
                   help='render detections for the first --show-n images '
                        '(reference tools/test.py --show-dir)')
    p.add_argument('--show-n', type=int, default=20)
    p.add_argument('--show-score-thr', type=float, default=0.3)
    p.add_argument('--flip-tta', action='store_true')
    p.add_argument('--scale-tta', type=float, nargs='+', default=[],
                   help='extra canvas scale ratios, e.g. 0.75 1.25 '
                        '(MultiScaleFlipAug scales equivalent)')
    p.add_argument('--samples-per-batch', type=int, default=2)
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args(argv)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict({
            kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1])
            for kv in args.cfg_options})
    model = build_detector(cfg.model)
    dataset = build_dataset(dict(cfg.data['test'], test_mode=True))

    sample = dataset[0]
    dummy = {k: jnp.asarray(v)[None] for k, v in sample.items()}
    k = jax.random.PRNGKey(0)
    variables = model.init({'params': k, 'sampler': k, 'dropout': k}, dummy,
                           train=True)
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        variables = {'params': state['params'],
                     'batch_stats': state['batch_stats']}
        print(f'[test] loaded {args.checkpoint}')
    else:
        print('[test] WARNING: no checkpoint — random weights')

    from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis import (
        run_inference)
    results = run_inference(model, variables, dataset,
                            samples_per_batch=args.samples_per_batch,
                            flip_tta=args.flip_tta,
                            scale_tta=tuple(args.scale_tta))
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
        print(f'[test] raw results saved to {args.out}')
    if args.show_dir:
        import os
        from unsupervised_domain_adaptation_object_detection_implementation_tpu.apis.inference import (
            show_result)
        os.makedirs(args.show_dir, exist_ok=True)
        for i in range(min(args.show_n, len(dataset))):
            info = dataset.data_infos[i]
            fname = info.get('filename') or info.get('file_name')
            img_path = os.path.join(dataset.img_prefix, fname)
            show_result(img_path, results[i], dataset.CLASSES,
                        score_thr=args.show_score_thr,
                        out_file=os.path.join(args.show_dir,
                                              os.path.basename(fname)))
        print(f'[test] wrote {min(args.show_n, len(dataset))} '
              f'visualizations to {args.show_dir}')
    metrics = dataset.evaluate(results, metric=args.eval)
    print('metrics:', {k_: round(float(v), 4) for k_, v in metrics.items()})


if __name__ == '__main__':
    main()
