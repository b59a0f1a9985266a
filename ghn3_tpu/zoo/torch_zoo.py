"""Canonical torch target architectures (ResNet family, ViT) for prediction
benchmarks and eval sweeps.

torchvision is not a dependency of this framework; these are standalone
implementations of the canonical architectures (He et al. 2015; Dosovitskiy et
al. 2020) matching the layer structure torchvision uses, so prediction graphs and
published per-arch metrics (`ghn3_results.json`) line up. Imports torch lazily.
"""

from __future__ import annotations


def _torch():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    return torch, nn, F


def _make_resnet(block, layers, width=64, num_classes=1000):
    torch, nn, F = _torch()

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, planes, stride=1, down=None):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = down

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + idt)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, planes, stride=1, down=None, base_width=64):
            super().__init__()
            w = int(planes * (base_width / 64.0))
            self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(w)
            self.conv3 = nn.Conv2d(w, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = down

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return F.relu(out + idt)

    blocks = {'basic': BasicBlock, 'bottleneck': Bottleneck}[block]

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.base_width = width
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._stage(blocks, 64, layers[0])
            self.layer2 = self._stage(blocks, 128, layers[1], stride=2)
            self.layer3 = self._stage(blocks, 256, layers[2], stride=2)
            self.layer4 = self._stage(blocks, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512 * blocks.expansion, num_classes)
            self.expected_input_sz = 224

        def _stage(self, blk, planes, n, stride=1):
            down = None
            if stride != 1 or self.inplanes != planes * blk.expansion:
                down = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * blk.expansion, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes * blk.expansion))
            kw = {'base_width': self.base_width} if blk is Bottleneck else {}
            stage = [blk(self.inplanes, planes, stride, down, **kw)]
            self.inplanes = planes * blk.expansion
            for _ in range(1, n):
                stage.append(blk(self.inplanes, planes, **kw))
            return nn.Sequential(*stage)

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return ResNet()


def resnet18(num_classes=1000):
    return _make_resnet('basic', [2, 2, 2, 2], num_classes=num_classes)


def resnet34(num_classes=1000):
    return _make_resnet('basic', [3, 4, 6, 3], num_classes=num_classes)


def resnet50(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 6, 3], num_classes=num_classes)


def resnet101(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 23, 3], num_classes=num_classes)


def resnet152(num_classes=1000):
    return _make_resnet('bottleneck', [3, 8, 36, 3], num_classes=num_classes)


def wide_resnet50_2(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 6, 3], width=128, num_classes=num_classes)


def vit_b_16(num_classes=1000, dim=768, depth=12, heads=12, patch=16):
    """ViT-B/16-style encoder with learned positional embedding."""
    torch, nn, F = _torch()

    class MHA(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
            self.to_out = nn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.to_qkv(x).reshape(b, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
            att = att.softmax(dim=-1)
            out = (att @ v).transpose(1, 2).reshape(b, n, c)
            return self.to_out(out)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(dim)
            self.attn = MHA()
            self.ln2 = nn.LayerNorm(dim)
            self.fc1 = nn.Linear(dim, dim * 4)
            self.fc2 = nn.Linear(dim * 4, dim)

        def forward(self, x):
            x = x + self.attn(self.ln1(x))
            return x + self.fc2(F.gelu(self.fc1(self.ln2(x))))

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            n_tok = (224 // patch) ** 2
            self.stem0 = nn.Conv2d(3, dim, patch, stride=patch, bias=False)
            self.pos_enc = nn.Embedding(n_tok, dim)
            self.blocks = nn.Sequential(*[Block() for _ in range(depth)])
            self.ln = nn.LayerNorm(dim)
            self.head = nn.Linear(dim, num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.stem0(x).flatten(2).transpose(1, 2)
            x = x + self.pos_enc(torch.arange(x.shape[1], device=x.device))[None]
            x = self.ln(self.blocks(x))
            return self.head(x.mean(1))

    return ViT()


def vgg16_bn(num_classes=1000):
    """VGG-16 with batch norm (Simonyan & Zisserman 2014 layout)."""
    torch, nn, F = _torch()
    cfgs = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
            512, 512, 512, 'M']
    layers = []
    cin = 3
    for v in cfgs:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.BatchNorm2d(v),
                       nn.ReLU(inplace=True)]
            cin = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                nn.Linear(512, 4096), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(4096, num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x)).flatten(1)
            return self.classifier(x)

    return VGG()


TORCH_ZOO = {
    'resnet18': resnet18,
    'resnet34': resnet34,
    'resnet50': resnet50,
    'resnet101': resnet101,
    'resnet152': resnet152,
    'wide_resnet50_2': wide_resnet50_2,
    'vit_b_16': vit_b_16,
    'vgg16_bn': vgg16_bn,
}
