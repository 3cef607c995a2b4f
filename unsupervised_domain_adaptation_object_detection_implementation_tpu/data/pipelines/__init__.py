from .transforms import (LoadImageFromFile, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, PhotoMetricDistortion,
                         PackDetInputs, Compose)

__all__ = ['LoadImageFromFile', 'LoadAnnotations', 'Resize', 'RandomFlip',
           'Normalize', 'Pad', 'PhotoMetricDistortion', 'PackDetInputs',
           'Compose']
