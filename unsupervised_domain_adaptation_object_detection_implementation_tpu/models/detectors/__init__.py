from .faster_rcnn import FasterRCNN, AnchorConfig
from .da_faster_rcnn import DAFasterRCNN, DALossWeights
from .cyda_faster_rcnn import CyDAFasterRCNN, DISC_KEYS
from .retinanet import RetinaNet, RetinaHead, RetinaSepBNHead
from .faster_rcnn_fpn import FasterRCNNFPN, FPNRPNHead
from .fcos import FCOS, FCOSHead
from .mask_rcnn import MaskRCNN, paste_masks
from .mask_rcnn_c4 import MaskRCNNC4, ResLayerSharedHead
from .cascade_rcnn import CascadeRCNN, CascadeMaskRCNN
from .yolov3 import YOLOV3, YOLOV3Neck
from .atss import ATSS, ATSSHead
from .centernet import CenterNet, CenterNetHead
from .ssd import SSD, SSDLite
from .detr import DETR, TransformerLayer
from .gfl import GFL, GFLHead
from .yolox import YOLOX, YOLOXHead
from .vfnet import VFNet, VFNetHead
from .reppoints import RepPoints, RepPointsHead, points2bbox_moment
from .yolof import YOLOF, YOLOFHead
from .fsaf import FSAF, FSAFHead
from .fovea import FoveaBox, FoveaHead
from .free_anchor import FreeAnchor
from .autoassign import AutoAssign
from .paa import PAA, gmm_split
from .deformable_detr import (DeformableDETR, MSDeformAttnLayer,
                              _focal_layer_loss)
from .sparse_rcnn import SparseRCNN, DIIHead
from .htc import HTC, HTCMaskHead, FusedSemanticHead
from .roi_variants import (MaskScoringRCNN, MaskIoUHead, DoubleHeadRCNN,
                           DoubleBBoxHead, DynamicRCNN, GridRCNN, GridHead,
                           PointRend, PointHead)
from .solo import SOLO, SOLOHead
from .yolact import YOLACT, YOLACTProtonet
from .cornernet import CornerNet, CornerPredictor
from .sabl_retina import SABLRetinaNet, SABLRetinaHead
from .ld import LDGFocal
from .rpn_detectors import (RPN, FastRCNN, GARetinaNet, GARPN, CascadeRPN,
                            CRPNFasterRCNN,
                            GuidedAnchorHead)
from .ld import LAD
from .nasfcos import NASFCOS
from .queryinst import QueryInst, DynamicMaskHead
from .scnet import SCNet, GlobalContextHead, FeatRelayHead
from .trident_faster_rcnn import TridentFasterRCNN
from .pisa import PISARetinaNet, PISASSDLite, PISAFasterRCNN
from .centripetal import CentripetalNet, CentripetalPredictor
from .panoptic_fpn import (PanopticFPN, PanopticFPNHead, heuristic_fuse,
                           INSTANCE_OFFSET)

__all__ = ['FasterRCNN', 'AnchorConfig', 'DAFasterRCNN', 'DALossWeights', 'CyDAFasterRCNN', 'DISC_KEYS', 'RetinaNet', 'RetinaHead', 'RetinaSepBNHead', 'FasterRCNNFPN', 'FPNRPNHead', 'FCOS', 'FCOSHead', 'MaskRCNN', 'paste_masks', 'CascadeRCNN', 'CascadeMaskRCNN', 'YOLOV3', 'YOLOV3Neck', 'ATSS', 'ATSSHead', 'CenterNet', 'CenterNetHead', 'SSD', 'SSDLite', 'DETR', 'TransformerLayer', 'GFL', 'GFLHead', 'YOLOX', 'YOLOXHead',
           'VFNet', 'VFNetHead', 'RepPoints', 'RepPointsHead',
           'points2bbox_moment', 'YOLOF', 'YOLOFHead', 'FSAF', 'FSAFHead',
           'FoveaBox', 'FoveaHead', 'FreeAnchor', 'AutoAssign', 'PAA',
           'gmm_split', 'DeformableDETR', 'MSDeformAttnLayer',
           'SparseRCNN', 'DIIHead',
           'HTC', 'HTCMaskHead', 'FusedSemanticHead',
           'MaskScoringRCNN', 'MaskIoUHead', 'DoubleHeadRCNN',
           'DoubleBBoxHead', 'DynamicRCNN', 'GridRCNN', 'GridHead',
           'PointRend', 'PointHead',
           'SOLO', 'SOLOHead', 'YOLACT', 'YOLACTProtonet', 'CornerNet',
           'CornerPredictor', 'SABLRetinaNet', 'SABLRetinaHead', 'LDGFocal',
           'RPN', 'FastRCNN', 'GARetinaNet', 'GARPN', 'CascadeRPN',
           'CRPNFasterRCNN',
           'GuidedAnchorHead', 'LAD', 'NASFCOS', 'QueryInst',
           'DynamicMaskHead', 'SCNet', 'GlobalContextHead', 'FeatRelayHead',
           'TridentFasterRCNN', 'PanopticFPN', 'PanopticFPNHead',
           'heuristic_fuse', 'INSTANCE_OFFSET', 'PISARetinaNet', 'PISAFasterRCNN',
           'PISASSDLite', 'CentripetalNet', 'CentripetalPredictor']
