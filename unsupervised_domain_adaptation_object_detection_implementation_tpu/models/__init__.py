from .builder import build_detector
from . import losses  # noqa: F401
from . import detectors as _detectors  # noqa: F401 — registers every detector
from .detectors.yolox import YOLOX
from .backbones.resnet import ResNet
from .backbones.da_resnet import DAResNet, Tap, VARIANT_TAPS
from .dense_heads.rpn_head import RPNHead
from .roi_heads.bbox_head import Shared2FCBBoxHead
from .detectors.faster_rcnn import FasterRCNN
from .detectors.da_faster_rcnn import DAFasterRCNN
from .detectors.retinanet import RetinaNet
from .detectors.faster_rcnn_fpn import FasterRCNNFPN
from .necks.fpn import FPN

__all__ = ['build_detector', 'ResNet', 'DAResNet', 'Tap', 'VARIANT_TAPS',
           'RPNHead', 'Shared2FCBBoxHead', 'FasterRCNN', 'DAFasterRCNN', 'RetinaNet', 'FasterRCNNFPN', 'FPN', 'YOLOX']
