from .resnet import ResNet, Bottleneck, BasicBlock
from .da_resnet import DAResNet, Tap, VARIANT_TAPS

__all__ = ['ResNet', 'Bottleneck', 'BasicBlock', 'DAResNet', 'Tap',
           'VARIANT_TAPS']
