from .transforms import (LoadImageFromFile, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, PhotoMetricDistortion,
                         PackDetInputs, Compose, MultiScaleFlipAug,
                         RandomCrop, Expand, MinIoURandomCrop, CutOut, Mosaic, MixUp)

__all__ = ['LoadImageFromFile', 'LoadAnnotations', 'Resize', 'RandomFlip',
           'Normalize', 'Pad', 'PhotoMetricDistortion', 'PackDetInputs',
           'Compose', 'MultiScaleFlipAug', 'RandomCrop', 'Expand',
           'MinIoURandomCrop', 'CutOut', 'Mosaic', 'MixUp']
