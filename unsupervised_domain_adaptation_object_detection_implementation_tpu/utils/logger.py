"""Logging + environment collection (reference `mmdet/utils/logger.py`
get_root_logger and `mmdet/utils/collect_env.py`)."""

from __future__ import annotations

import logging
import platform
import sys
from typing import Dict, Optional

_LOGGER_NAME = 'udaod_tpu'


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def collect_env() -> Dict[str, str]:
    """Environment snapshot for logs/bug reports."""
    import jax
    import numpy as np
    env = {
        'python': sys.version.replace('\n', ' '),
        'platform': platform.platform(),
        'jax': jax.__version__,
        'numpy': np.__version__,
        'devices': ', '.join(str(d) for d in jax.devices()),
        'process_count': str(jax.process_count()),
        'default_backend': jax.default_backend(),
    }
    try:
        import flax
        env['flax'] = flax.__version__
        import optax
        env['optax'] = optax.__version__
    except Exception:
        pass
    from ..version import __version__
    env['udaod_tpu'] = __version__
    return env
