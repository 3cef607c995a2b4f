from .fpn import FPN
from .pafpn import PAFPN
from .yolox_pafpn import YOLOXPAFPN

__all__ = ['FPN', 'PAFPN', 'YOLOXPAFPN']
