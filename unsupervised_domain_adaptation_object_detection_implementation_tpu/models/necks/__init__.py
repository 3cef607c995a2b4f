from .fpn import FPN
from .pafpn import PAFPN
from .yolox_pafpn import YOLOXPAFPN
from .zoo_necks import (ChannelMapper, BFP, HRFPN, DilatedEncoder, SSDNeck,
                        CTResNetNeck, NASFCOS_FPN, FPN_CARAFE, NASFPN)

__all__ = ['FPN', 'PAFPN', 'YOLOXPAFPN', 'ChannelMapper', 'BFP', 'HRFPN',
           'DilatedEncoder', 'SSDNeck', 'CTResNetNeck', 'NASFCOS_FPN',
           'FPN_CARAFE', 'NASFPN']
