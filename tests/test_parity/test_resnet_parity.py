"""ResNet-50 feature parity: torch (torchvision layout) vs our flax trunk.

Builds a torch ResNet-50 with torchvision's exact module/state-dict layout
(`conv1/bn1/layer{1..4}.{b}.conv{1..3}/bn{1..3}/downsample.{0,1}`), randomizes
weights AND BN running stats, converts the state dict through
`utils/checkpoint.py:convert_torch_resnet`, and asserts all four stage
feature maps agree. This validates both the converter (the path real
`torchvision://resnet50` weights take, reference init
`da_configs/_base_/models/faster_rcnn_r50_torch_daf.py:19-21`) and the trunk
math (conv padding, frozen-BN folding, maxpool semantics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip('torch')
from torch import nn as tnn  # noqa: E402

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones.resnet import (  # noqa: E402
    ResNet)
from unsupervised_domain_adaptation_object_detection_implementation_tpu.utils.checkpoint import (  # noqa: E402
    convert_torch_resnet)


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1, inplanes = self._make(64, 3, 1, 64)
        self.layer2, inplanes = self._make(inplanes, 4, 2, 128)
        self.layer3, inplanes = self._make(inplanes, 6, 2, 256)
        self.layer4, inplanes = self._make(inplanes, 3, 2, 512)

    @staticmethod
    def _make(inplanes, blocks, stride, planes):
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(inplanes, planes, stride, downsample)]
        inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_Bottleneck(inplanes, planes))
        return tnn.Sequential(*layers), inplanes

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c1 = self.layer1(x)
        c2 = self.layer2(c1)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return c1, c2, c3, c4


def test_resnet50_feature_parity():
    torch.manual_seed(0)
    model = _TVResNet50().eval()
    # randomize BN affine + running stats so the folding math is exercised
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.2, 0.2, generator=gen)
                m.running_mean.uniform_(-0.1, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)

    x = torch.randn(1, 3, 64, 96, generator=gen)
    with torch.no_grad():
        want = [t.permute(0, 2, 3, 1).numpy() for t in model(x)]

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    converted = convert_torch_resnet(state)
    rn = ResNet(depth=50, out_indices=(0, 1, 2, 3))
    got = rn.apply({'params': converted['params'],
                    'batch_stats': converted['batch_stats']},
                   jnp.asarray(x.permute(0, 2, 3, 1).numpy()))

    assert len(got) == 4
    for stage, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g)
        assert g.shape == w.shape, f'stage {stage}: {g.shape} vs {w.shape}'
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(g / scale, w / scale, atol=2e-5,
                                   err_msg=f'stage {stage}')
