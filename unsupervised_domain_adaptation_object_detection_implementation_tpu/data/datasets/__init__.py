from .custom import CustomDataset
from .xml_style import XMLDataset, VOCDataset, DADataset, CITYSCAPES_DA_CLASSES
from .coco import CocoDataset
from .wrappers import (ConcatDataset, RepeatDataset, ClassBalancedDataset,
                       MultiImageMixDataset)

__all__ = ['CustomDataset', 'XMLDataset', 'VOCDataset', 'DADataset',
           'CITYSCAPES_DA_CLASSES', 'CocoDataset', 'ConcatDataset',
           'RepeatDataset', 'ClassBalancedDataset', 'MultiImageMixDataset']
