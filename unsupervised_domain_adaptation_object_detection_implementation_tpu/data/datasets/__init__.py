from .custom import CustomDataset
from .xml_style import XMLDataset, VOCDataset, DADataset, CITYSCAPES_DA_CLASSES
from .coco import CocoDataset
from .wrappers import (ConcatDataset, RepeatDataset, ClassBalancedDataset,
                       MultiImageMixDataset)
from .extra_datasets import (CityscapesDataset, LVISV05Dataset,
                             LVISV1Dataset, WIDERFaceDataset,
                             DeepFashionDataset)

__all__ = ['CustomDataset', 'XMLDataset', 'VOCDataset', 'DADataset',
           'CITYSCAPES_DA_CLASSES', 'CocoDataset', 'ConcatDataset',
           'RepeatDataset', 'ClassBalancedDataset', 'MultiImageMixDataset',
           'CityscapesDataset', 'LVISV05Dataset', 'LVISV1Dataset',
           'WIDERFaceDataset', 'DeepFashionDataset']
