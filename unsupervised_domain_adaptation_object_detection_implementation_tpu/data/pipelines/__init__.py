from .transforms import (LoadImageFromFile, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, PhotoMetricDistortion,
                         PackDetInputs, Compose, MultiScaleFlipAug)

__all__ = ['LoadImageFromFile', 'LoadAnnotations', 'Resize', 'RandomFlip',
           'Normalize', 'Pad', 'PhotoMetricDistortion', 'PackDetInputs',
           'Compose', 'MultiScaleFlipAug']
