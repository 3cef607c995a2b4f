from .faster_rcnn import FasterRCNN, AnchorConfig
from .da_faster_rcnn import DAFasterRCNN, DALossWeights
from .cyda_faster_rcnn import CyDAFasterRCNN, DISC_KEYS

__all__ = ['FasterRCNN', 'AnchorConfig', 'DAFasterRCNN', 'DALossWeights', 'CyDAFasterRCNN', 'DISC_KEYS']
