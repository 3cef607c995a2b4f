from .transforms import (LoadImageFromFile, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, PhotoMetricDistortion,
                         PackDetInputs, Compose, MultiScaleFlipAug,
                         RandomCrop, Expand, MinIoURandomCrop, CutOut,
                         Mosaic, MixUp)
from .auto_augment import (AutoAugment, Shear, Rotate, Translate,
                           ColorTransform, BrightnessTransform,
                           ContrastTransform, EqualizeTransform,
                           autoaug_policy_v0)

from .third_party import Albu, InstaBoost
from .transforms import LoadProposals, RandomAffine

__all__ = ['Albu', 'InstaBoost', 'LoadProposals', 'RandomAffine',
           'LoadImageFromFile', 'LoadAnnotations', 'Resize', 'RandomFlip',
           'Normalize', 'Pad', 'PhotoMetricDistortion', 'PackDetInputs',
           'Compose', 'MultiScaleFlipAug', 'RandomCrop', 'Expand',
           'MinIoURandomCrop', 'CutOut', 'Mosaic', 'MixUp',
           'AutoAugment', 'Shear', 'Rotate', 'Translate', 'ColorTransform',
           'BrightnessTransform', 'ContrastTransform', 'EqualizeTransform',
           'autoaug_policy_v0']
