from .faster_rcnn import FasterRCNN, AnchorConfig
from .da_faster_rcnn import DAFasterRCNN, DALossWeights

__all__ = ['FasterRCNN', 'AnchorConfig', 'DAFasterRCNN', 'DALossWeights']
