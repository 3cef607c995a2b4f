from .faster_rcnn import FasterRCNN, AnchorConfig
from .da_faster_rcnn import DAFasterRCNN, DALossWeights
from .cyda_faster_rcnn import CyDAFasterRCNN, DISC_KEYS
from .retinanet import RetinaNet, RetinaHead
from .faster_rcnn_fpn import FasterRCNNFPN, FPNRPNHead
from .fcos import FCOS, FCOSHead
from .mask_rcnn import MaskRCNN, paste_masks
from .cascade_rcnn import CascadeRCNN
from .yolov3 import YOLOV3, YOLOV3Neck
from .atss import ATSS, ATSSHead
from .centernet import CenterNet, CenterNetHead
from .ssd import SSDLite
from .detr import DETR, TransformerLayer
from .gfl import GFL, GFLHead
from .yolox import YOLOX, YOLOXHead

__all__ = ['FasterRCNN', 'AnchorConfig', 'DAFasterRCNN', 'DALossWeights', 'CyDAFasterRCNN', 'DISC_KEYS', 'RetinaNet', 'RetinaHead', 'FasterRCNNFPN', 'FPNRPNHead', 'FCOS', 'FCOSHead', 'MaskRCNN', 'paste_masks', 'CascadeRCNN', 'YOLOV3', 'YOLOV3Neck', 'ATSS', 'ATSSHead', 'CenterNet', 'CenterNetHead', 'SSDLite', 'DETR', 'TransformerLayer', 'GFL', 'GFLHead', 'YOLOX', 'YOLOXHead']
