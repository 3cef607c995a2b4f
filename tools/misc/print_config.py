#!/usr/bin/env python
"""Print the fully-resolved config (reference `tools/misc/print_config.py`)."""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils import (  # noqa: E402
    Config)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.config import (  # noqa: E402
    parse_option_value)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=[])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict({
            kv.split('=', 1)[0]: parse_option_value(kv.split('=', 1)[1])
            for kv in args.cfg_options})
    for k in cfg.keys():
        print(f'{k} = {pprint.pformat(cfg[k], width=100)}')


if __name__ == '__main__':
    main()
