from .resnet import ResNet, Bottleneck, BasicBlock
from .da_resnet import DAResNet, Tap, VARIANT_TAPS
from .swin import SwinTransformer
from .misc_backbones import MobileNetV2, Darknet53
from .csp_darknet import CSPDarknet

__all__ = ['ResNet', 'Bottleneck', 'BasicBlock', 'DAResNet', 'Tap',
           'VARIANT_TAPS', 'SwinTransformer', 'MobileNetV2', 'Darknet53', 'CSPDarknet']
