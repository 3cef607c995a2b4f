from .mean_ap import (average_precision, tpfp_default, eval_map, eval_recalls)

__all__ = ['average_precision', 'tpfp_default', 'eval_map', 'eval_recalls']
