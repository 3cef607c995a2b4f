from .resnet import ResNet, Bottleneck, BasicBlock
from .da_resnet import DAResNet, Tap, VARIANT_TAPS
from .swin import SwinTransformer
from .misc_backbones import MobileNetV2, Darknet53
from .csp_darknet import CSPDarknet
from .zoo_backbones import Res2Net, RegNet, ResNeSt, SSDVGG, regnet_widths
from .hrnet import HRNet
from .pvt import PVT
from .hourglass import HourglassNet

from .trident_resnet import TridentResNet, TridentBlock
from .detectors_resnet import DetectoRSResNet, SACBottleneck

__all__ = ['TridentResNet', 'TridentBlock', 'DetectoRSResNet', 'SACBottleneck', 'ResNet', 'Bottleneck', 'BasicBlock', 'DAResNet', 'Tap',
           'VARIANT_TAPS', 'SwinTransformer', 'MobileNetV2', 'Darknet53',
           'CSPDarknet', 'Res2Net', 'RegNet', 'ResNeSt', 'SSDVGG',
           'regnet_widths', 'HRNet', 'PVT', 'HourglassNet']
