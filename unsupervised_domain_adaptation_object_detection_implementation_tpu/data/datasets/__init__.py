from .custom import CustomDataset
from .xml_style import XMLDataset, VOCDataset, DADataset, CITYSCAPES_DA_CLASSES
from .coco import CocoDataset
from .wrappers import (ConcatDataset, RepeatDataset, ClassBalancedDataset,
                       MultiImageMixDataset)
from .extra_datasets import (CityscapesDataset, LVISV05Dataset,
                             LVISV1Dataset, WIDERFaceDataset,
                             DeepFashionDataset)

from .coco_panoptic import CocoPanopticDataset, pq_compute

__all__ = ['CocoPanopticDataset', 'pq_compute',
           'CustomDataset', 'XMLDataset', 'VOCDataset', 'DADataset',
           'CITYSCAPES_DA_CLASSES', 'CocoDataset', 'ConcatDataset',
           'RepeatDataset', 'ClassBalancedDataset', 'MultiImageMixDataset',
           'CityscapesDataset', 'LVISV05Dataset', 'LVISV1Dataset',
           'WIDERFaceDataset', 'DeepFashionDataset']
