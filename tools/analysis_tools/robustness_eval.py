#!/usr/bin/env python
"""Summarize corruption-robustness results (reference
`tools/analysis_tools/robustness_eval.py`): aggregate one or more
`robustness.json` files written by `test_robustness.py` into the standard
mPC/rPC table (per corruption, per severity)."""
import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('results', nargs='+', help='robustness.json file(s)')
    p.add_argument('--severities', nargs='+', type=int,
                   default=[1, 2, 3, 4, 5])
    args = p.parse_args()
    for path in args.results:
        with open(path) as f:
            rep = json.load(f)
        print(f'== {path} ==')
        print(f"clean P: {rep['clean']:.4f}")
        table = rep['table']
        for corr, sev_map in table.items():
            row = [sev_map.get(str(s), sev_map.get(s)) for s in
                   args.severities]
            vals = [f'{v:.3f}' if v is not None else ' -- ' for v in row]
            mean = np.mean([v for v in row if v is not None])
            print(f'{corr:<16}: ' + ' '.join(vals) + f'  | mean {mean:.3f}')
        print(f"mPC: {rep['mPC']:.4f}   rPC: {rep['rPC']:.4f}")


if __name__ == '__main__':
    main()
