from .registry import (Registry, MODELS, BACKBONES, NECKS, HEADS, LOSSES,
                       DETECTORS, DATASETS, PIPELINES, BBOX_ASSIGNERS,
                       BBOX_SAMPLERS, BBOX_CODERS, ANCHOR_GENERATORS)
from .config import Config, ConfigDict, merge_dict

__all__ = ['Registry', 'MODELS', 'BACKBONES', 'NECKS', 'HEADS', 'LOSSES',
           'DETECTORS', 'DATASETS', 'PIPELINES', 'BBOX_ASSIGNERS',
           'BBOX_SAMPLERS', 'BBOX_CODERS', 'ANCHOR_GENERATORS', 'Config',
           'ConfigDict', 'merge_dict']
