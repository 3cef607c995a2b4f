from .fpn import FPN
from .pafpn import PAFPN
from .yolox_pafpn import YOLOXPAFPN
from .rfp import RFP, DetectoRSHTC, DetectoRSCascadeRCNN
from .zoo_necks import (ChannelMapper, BFP, HRFPN, DilatedEncoder, SSDNeck,
                        CTResNetNeck, NASFCOS_FPN, FPN_CARAFE, NASFPN, FPG)

__all__ = ['RFP', 'DetectoRSHTC', 'DetectoRSCascadeRCNN', 'FPN', 'PAFPN', 'YOLOXPAFPN', 'ChannelMapper', 'BFP', 'HRFPN',
           'DilatedEncoder', 'SSDNeck', 'CTResNetNeck', 'NASFCOS_FPN',
           'FPN_CARAFE', 'NASFPN', 'FPG']
