#!/usr/bin/env python
"""Training-log analysis (reference `tools/analysis_tools/analyze_logs.py`):
plot/summarize metric curves from work_dir/train_log.jsonl."""
import argparse
import json


def load_log(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def main():
    p = argparse.ArgumentParser()
    p.add_argument('json_log')
    p.add_argument('--keys', nargs='+', default=['loss'])
    p.add_argument('--mode', default='train')
    p.add_argument('--plot-out', default=None)
    args = p.parse_args()
    recs = [r for r in load_log(args.json_log) if r.get('mode') == args.mode]
    if not recs:
        print('no records')
        return
    for key in args.keys:
        vals = [r[key] for r in recs if key in r]
        if not vals:
            continue
        print(f'{key}: first={vals[0]:.4f} last={vals[-1]:.4f} '
              f'min={min(vals):.4f} max={max(vals):.4f} n={len(vals)}')
    if args.plot_out:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for key in args.keys:
            vals = [r[key] for r in recs if key in r]
            plt.plot(vals, label=key)
        plt.legend()
        plt.xlabel('log step')
        plt.savefig(args.plot_out)
        print('saved', args.plot_out)


if __name__ == '__main__':
    main()
