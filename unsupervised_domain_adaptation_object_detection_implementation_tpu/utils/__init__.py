from .registry import (Registry, MODELS, BACKBONES, NECKS, HEADS, LOSSES,
                       DETECTORS, DATASETS, PIPELINES, BBOX_ASSIGNERS,
                       BBOX_SAMPLERS, BBOX_CODERS, ANCHOR_GENERATORS)
from .config import Config, ConfigDict, merge_dict

__all__ = ['Registry', 'MODELS', 'BACKBONES', 'NECKS', 'HEADS', 'LOSSES',
           'DETECTORS', 'DATASETS', 'PIPELINES', 'BBOX_ASSIGNERS',
           'BBOX_SAMPLERS', 'BBOX_CODERS', 'ANCHOR_GENERATORS', 'Config',
           'ConfigDict', 'merge_dict']
from .checkpoint import (save_checkpoint, load_checkpoint, latest_checkpoint,
                         convert_torch_resnet, convert_torch_swin,
                         convert_torch_pvt, detect_and_convert,
                         load_pretrained_backbone)
__all__ += ['save_checkpoint', 'load_checkpoint', 'latest_checkpoint',
            'convert_torch_resnet', 'convert_torch_swin', 'convert_torch_pvt',
            'detect_and_convert', 'load_pretrained_backbone']
from .profiling import profile_time, measure_fps, sync, trace
__all__ += ['profile_time', 'measure_fps', 'sync', 'trace']
from .logger import get_root_logger, collect_env
__all__ += ['get_root_logger', 'collect_env']
