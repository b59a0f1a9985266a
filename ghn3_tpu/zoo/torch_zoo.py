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


def _make_resnet(block, layers, width=64, num_classes=1000, groups=1):
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
            w = int(planes * (base_width / 64.0)) * groups
            self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, stride=stride, padding=1, groups=groups,
                                   bias=False)
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


def wide_resnet101_2(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 23, 3], width=128, num_classes=num_classes)


def resnext50_32x4d(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 6, 3], width=4, groups=32,
                        num_classes=num_classes)


def resnext101_32x8d(num_classes=1000):
    return _make_resnet('bottleneck', [3, 4, 23, 3], width=8, groups=32,
                        num_classes=num_classes)


_VIT_CLASSES = None


def vit_classes():
    """Structurally-exact torchvision VisionTransformer classes (torchvision
    models/vision_transformer.py), memoized at module scope: bare
    ``class_token`` parameter, learned ``encoder.pos_embedding`` (with
    class-token row), ``nn.MultiheadAttention`` (qkv bias via in_proj),
    torchvision module/parameter naming throughout. vit_b_16(1000) has exactly
    86,567,656 parameters — torchvision's published count. Per the reference
    semantics (graph.py:1113-1129 MODULES table + filter), ``class_token`` is
    traced but never predicted (it keeps its zeros init) and ``pos_embedding``
    decodes through the 3-D tile path (nn.py:439-447).

    Attention runs with ``need_weights=True`` to force the explicit
    bmm+softmax autograd path: torch >= 2.0 otherwise fuses attention into one
    SDPA node, whereas the published GHN checkpoints were trained on graphs
    with explicit Softmax (msa) nodes (reference graph.py:553-574 softmax
    rewiring presumes them).

    Returns ``(VisionTransformer, Encoder)``. The classes live at module scope
    (one identity for all vit_* factories) so the tests' torchvision shim can
    alias them — the reference's exact-type ``MODULES[type(module)]`` lookup
    and isinstance-gated ViT fixes then engage during golden comparisons; in
    a real torchvision environment the reference sees real torchvision models
    instead."""
    global _VIT_CLASSES
    if _VIT_CLASSES is not None:
        return _VIT_CLASSES
    torch, nn, F = _torch()
    from collections import OrderedDict

    class EncoderBlock(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
            self.self_attention = nn.MultiheadAttention(dim, heads, batch_first=True)
            self.dropout = nn.Dropout(0.0)
            self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = nn.Sequential(nn.Linear(dim, dim * 4), nn.GELU(),
                                     nn.Dropout(0.0), nn.Linear(dim * 4, dim),
                                     nn.Dropout(0.0))

        def forward(self, input):
            x = self.ln_1(input)
            x, _ = self.self_attention(x, x, x, need_weights=True)
            x = self.dropout(x)
            x = x + input
            y = self.mlp(self.ln_2(x))
            return x + y

    class Encoder(nn.Module):
        def __init__(self, seq_length, dim, depth, heads):
            super().__init__()
            self.pos_embedding = nn.Parameter(
                torch.empty(1, seq_length, dim).normal_(std=0.02))
            self.dropout = nn.Dropout(0.0)
            self.layers = nn.Sequential(OrderedDict(
                ('encoder_layer_%d' % i, EncoderBlock(dim, heads))
                for i in range(depth)))
            self.ln = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, input):
            input = input + self.pos_embedding
            return self.ln(self.layers(self.dropout(input)))

    class VisionTransformer(nn.Module):
        def __init__(self, num_classes=1000, dim=768, depth=12, heads=12,
                     patch=16, img_size=224):
            super().__init__()
            seq_length = (img_size // patch) ** 2 + 1
            self.conv_proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)
            self.class_token = nn.Parameter(torch.zeros(1, 1, dim))
            self.encoder = Encoder(seq_length, dim, depth, heads)
            self.heads = nn.Sequential(OrderedDict(
                head=nn.Linear(dim, num_classes)))
            self.expected_input_sz = img_size

        def forward(self, x):
            n = x.shape[0]
            x = self.conv_proj(x).flatten(2).permute(0, 2, 1)
            batch_class_token = self.class_token.expand(n, -1, -1)
            x = torch.cat([batch_class_token, x], dim=1)
            x = self.encoder(x)
            return self.heads(x[:, 0])

    _VIT_CLASSES = (VisionTransformer, Encoder)
    return _VIT_CLASSES


def vit_b_16(num_classes=1000, dim=768, depth=12, heads=12, patch=16,
             img_size=224):
    """torchvision-exact ViT (see :func:`vit_classes`)."""
    ViT, _ = vit_classes()
    return ViT(num_classes=num_classes, dim=dim, depth=depth, heads=heads,
               patch=patch, img_size=img_size)


VGG_CFGS = {
    11: [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
    13: [64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
    16: [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
         512, 512, 512, 'M'],
    19: [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512, 512,
         'M', 512, 512, 512, 512, 'M'],
}


def vgg16_bn(num_classes=1000, depth=16):
    """VGG with batch norm (Simonyan & Zisserman 2014 layout)."""
    torch, nn, F = _torch()
    cfgs = VGG_CFGS[depth]
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
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 49, 4096), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(4096, num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x)).flatten(1)
            return self.classifier(x)

    return VGG()





def mobilenet_v2(num_classes=1000, width_mult=1.0):
    """MobileNetV2 (Sandler et al. 2018): inverted residuals, depthwise convs."""
    torch, nn, F = _torch()

    def c_round(c):
        c = int(c * width_mult)
        return max(8, (c + 4) // 8 * 8)

    class ConvBNReLU(nn.Sequential):
        def __init__(self, cin, cout, k=3, stride=1, groups=1):
            super().__init__(
                nn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU6(inplace=True))

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            hidden = int(round(cin * expand))
            self.use_res = stride == 1 and cin == cout
            layers = []
            if expand != 1:
                layers.append(ConvBNReLU(cin, hidden, k=1))
            layers += [ConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
                       nn.Conv2d(hidden, cout, 1, bias=False),
                       nn.BatchNorm2d(cout)]
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    class MobileNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            cin = c_round(32)
            feats = [ConvBNReLU(3, cin, stride=2)]
            for t, c, n, s in cfg:
                cout = c_round(c)
                for i in range(n):
                    feats.append(InvertedResidual(cin, cout, s if i == 0 else 1, t))
                    cin = cout
            last = c_round(1280)
            feats.append(ConvBNReLU(cin, last, k=1))
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(last, num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.features(x).mean(dim=(2, 3))
            return self.classifier(x)

    return MobileNetV2()


def squeezenet1_1(num_classes=1000, version='1_1'):
    """SqueezeNet (Iandola et al. 2016): fire modules, conv classifier.
    1.0 uses a 7x7/96 stem and later pool positions (torchvision layout)."""
    torch, nn, F = _torch()

    class Fire(nn.Module):
        def __init__(self, cin, squeeze, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, squeeze, 1)
            self.expand1x1 = nn.Conv2d(squeeze, e1, 1)
            self.expand3x3 = nn.Conv2d(squeeze, e3, 3, padding=1)

        def forward(self, x):
            x = F.relu(self.squeeze(x))
            return torch.cat([F.relu(self.expand1x1(x)), F.relu(self.expand3x3(x))], 1)

    try:  # subclass torchvision's class when present so isinstance-based
        # tooling (including the reference implementation) recognizes it
        from torchvision.models import SqueezeNet as _SqueezeBase
    except ImportError:
        _SqueezeBase = nn.Module

    class SqueezeNet(_SqueezeBase):
        def __init__(self):
            nn.Module.__init__(self)
            if version == '1_0':
                feats = [
                    nn.Conv2d(3, 96, 7, stride=2), nn.ReLU(inplace=True),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(96, 16, 64, 64), Fire(128, 16, 64, 64),
                    Fire(128, 32, 128, 128),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
                    Fire(384, 48, 192, 192), Fire(384, 64, 256, 256),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(512, 64, 256, 256)]
            else:
                feats = [
                    nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(inplace=True),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(64, 16, 64, 64), Fire(128, 16, 64, 64),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(128, 32, 128, 128), Fire(256, 32, 128, 128),
                    nn.MaxPool2d(3, stride=2, ceil_mode=True),
                    Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
                    Fire(384, 64, 256, 256), Fire(512, 64, 256, 256)]
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(
                nn.Dropout(0.5), nn.Conv2d(512, num_classes, 1), nn.ReLU(inplace=True))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.classifier(self.features(x))
            return torch.flatten(x.mean(dim=(2, 3)), 1)

    return SqueezeNet()


def densenet121(num_classes=1000, growth=32, block_config=(6, 12, 24, 16),
                init_features=64):
    """DenseNet (Huang et al. 2017): dense blocks + transition layers.
    densenet161 uses growth 48 with 96 initial features (torchvision)."""
    torch, nn, F = _torch()

    class DenseLayer(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            y = self.conv1(F.relu(self.norm1(x)))
            return self.conv2(F.relu(self.norm2(y)))

    class DenseBlock(nn.Module):
        def __init__(self, cin, n):
            super().__init__()
            self.layers = nn.ModuleList(DenseLayer(cin + i * growth) for i in range(n))

        def forward(self, x):
            feats = [x]
            for layer in self.layers:
                feats.append(layer(torch.cat(feats, 1) if len(feats) > 1 else feats[0]))
            return torch.cat(feats, 1)

    class Transition(nn.Sequential):
        def __init__(self, cin, cout):
            super().__init__(nn.BatchNorm2d(cin), nn.ReLU(inplace=True),
                             nn.Conv2d(cin, cout, 1, bias=False),
                             nn.AvgPool2d(2, stride=2))

    class DenseNet(nn.Module):
        def __init__(self):
            super().__init__()
            c = init_features
            feats = [nn.Conv2d(3, c, 7, stride=2, padding=3, bias=False),
                     nn.BatchNorm2d(c), nn.ReLU(inplace=True),
                     nn.MaxPool2d(3, stride=2, padding=1)]
            for i, n in enumerate(block_config):
                feats.append(DenseBlock(c, n))
                c += n * growth
                if i < len(block_config) - 1:
                    feats.append(Transition(c, c // 2))
                    c //= 2
            feats.append(nn.BatchNorm2d(c))
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Linear(c, num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = F.relu(self.features(x)).mean(dim=(2, 3))
            return self.classifier(x)

    return DenseNet()


def efficientnet_b0ish(num_classes=1000):
    """EfficientNet-style MBConv net with squeeze-excite (exercises the CSE path
    at full scale: sigmoid gating + depthwise convs)."""
    torch, nn, F = _torch()

    class SE(nn.Module):
        def __init__(self, c, r=4):
            super().__init__()
            self.fc1 = nn.Conv2d(c, max(1, c // r), 1)
            self.fc2 = nn.Conv2d(max(1, c // r), c, 1)

        def forward(self, x):
            s = x.mean(dim=(2, 3), keepdim=True)
            s = torch.sigmoid(self.fc2(F.silu(self.fc1(s))))
            return x * s

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand, k=3):
            super().__init__()
            hidden = cin * expand
            self.use_res = stride == 1 and cin == cout
            layers = []
            if expand != 1:
                layers += [nn.Conv2d(cin, hidden, 1, bias=False),
                           nn.BatchNorm2d(hidden), nn.SiLU(inplace=True)]
            layers += [nn.Conv2d(hidden, hidden, k, stride, k // 2, groups=hidden, bias=False),
                       nn.BatchNorm2d(hidden), nn.SiLU(inplace=True),
                       SE(hidden),
                       nn.Conv2d(hidden, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            self.block = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.block(x) if self.use_res else self.block(x)

    cfg = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
           (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]

    class EffNet(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
                     nn.BatchNorm2d(32), nn.SiLU(inplace=True)]
            cin = 32
            for t, c, n, s, k in cfg:
                for i in range(n):
                    feats.append(MBConv(cin, c, s if i == 0 else 1, t, k))
                    cin = c
            feats += [nn.Conv2d(cin, 1280, 1, bias=False), nn.BatchNorm2d(1280),
                      nn.SiLU(inplace=True)]
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Linear(1280, num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            return self.classifier(self.features(x).mean(dim=(2, 3)))

    return EffNet()





def efficientnet_v1(variant='efficientnet_b0', num_classes=1000, w=1.0):
    """EfficientNet B0-B7 (Tan & Le 2019), torchvision layout: compound-scaled
    MBConv stages (zoo/configs.py) with squeeze-excitation computed from the
    UNexpanded block input (squeeze = max(1, cin//4)) and a stochastic-depth
    ramp to 0.2 across blocks. The reference sweeps these via torchvision
    (/root/reference/eval_ghn.py:73-91); param counts pinned in tests."""
    torch, nn, F = _torch()
    from .configs import efficientnet_v1_config
    stem, rows, head = efficientnet_v1_config(variant, w)

    class StochasticDepth(nn.Module):
        def __init__(self, p):
            super().__init__()
            self.p = p

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            noise = torch.empty([x.shape[0], 1, 1, 1], dtype=x.dtype, device=x.device)
            noise.bernoulli_(keep).div_(keep)
            return x * noise

    class SE(nn.Module):
        def __init__(self, c, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(c, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, c, 1)

        def forward(self, x):
            s = self.fc2(F.silu(self.fc1(self.avgpool(x))))
            return x * torch.sigmoid(s)

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand, k, sd_prob):
            super().__init__()
            hidden = cin * expand
            self.use_res = stride == 1 and cin == cout
            layers = []
            if expand != 1:
                layers += [nn.Conv2d(cin, hidden, 1, bias=False),
                           nn.BatchNorm2d(hidden), nn.SiLU(inplace=True)]
            layers += [nn.Conv2d(hidden, hidden, k, stride, k // 2, groups=hidden,
                                 bias=False),
                       nn.BatchNorm2d(hidden), nn.SiLU(inplace=True),
                       SE(hidden, max(1, cin // 4)),
                       nn.Conv2d(hidden, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            self.block = nn.Sequential(*layers)
            self.sd = StochasticDepth(sd_prob)

        def forward(self, x):
            return x + self.sd(self.block(x)) if self.use_res else self.block(x)

    total_blocks = sum(r[5] for r in rows)

    class EffNet(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [nn.Conv2d(3, stem, 3, stride=2, padding=1, bias=False),
                     nn.BatchNorm2d(stem), nn.SiLU(inplace=True)]
            block_id = 0
            for t, k, s, cin, cout, n in rows:
                for i in range(n):
                    feats.append(MBConv(cin if i == 0 else cout, cout,
                                        s if i == 0 else 1, t, k,
                                        0.2 * block_id / total_blocks))
                    block_id += 1
            feats += [nn.Conv2d(rows[-1][4], head, 1, bias=False),
                      nn.BatchNorm2d(head), nn.SiLU(inplace=True)]
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(head, num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            return self.classifier(self.features(x).mean(dim=(2, 3)))

    return EffNet()


def convnext_tiny_ish(num_classes=1000, dims=(96, 192, 384, 768), depths=(2, 2, 4, 2)):
    """ConvNeXt-style stages (Liu et al. 2022): depthwise 7x7 + LayerNorm2d +
    pointwise MLP + layer_scale. layer_scale tensors are bare parameters that the
    GHN does not predict (same as the reference — they stay at their init)."""
    torch, nn, F = _torch()

    try:  # the exact torchvision class when present (type-keyed tooling,
        # including the reference MODULES table, requires the exact type)
        from torchvision.models import convnext as _cn
        LayerNorm2d = _cn.LayerNorm2d
    except ImportError:
        class LayerNorm2d(nn.LayerNorm):
            """Channel-wise LN on NCHW maps (recognized as the 'ln' primitive)."""

            def forward(self, x):
                x = x.permute(0, 2, 3, 1)
                x = super().forward(x)
                return x.permute(0, 3, 1, 2)

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim)
            self.pwconv1 = nn.Linear(dim, 4 * dim)
            self.pwconv2 = nn.Linear(4 * dim, dim)
            self.layer_scale = nn.Parameter(1e-6 * torch.ones(dim))

        def forward(self, x):
            y = self.dwconv(x).permute(0, 2, 3, 1)
            y = self.pwconv2(F.gelu(self.pwconv1(self.norm(y))))
            y = (self.layer_scale * y).permute(0, 3, 1, 2)
            return x + y

    class ConvNeXt(nn.Module):
        def __init__(self):
            super().__init__()
            stages = [nn.Conv2d(3, dims[0], 4, stride=4), LayerNorm2d(dims[0])]
            for i, (d, n) in enumerate(zip(dims, depths)):
                if i > 0:
                    stages += [LayerNorm2d(dims[i - 1]),
                               nn.Conv2d(dims[i - 1], d, 2, stride=2)]
                stages += [Block(d) for _ in range(n)]
            self.features = nn.Sequential(*stages)
            self.norm = nn.LayerNorm(dims[-1])
            self.head = nn.Linear(dims[-1], num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.features(x).mean(dim=(2, 3))
            return self.head(self.norm(x))

    return ConvNeXt()





def inception_v3ish(num_classes=1000, c=32):
    """Inception-v3-style net: parallel mixed blocks, 299x299 inputs, auxiliary
    classifier tuple output in training mode (the reference special-cases
    Inception3: 299px tracing input and aux handling, graph.py:325, eval_ghn)."""
    torch, nn, F = _torch()
    try:  # subclass torchvision's class so isinstance-gated handling engages
        from torchvision.models import Inception3 as _InceptionBase
    except ImportError:
        _InceptionBase = nn.Module

    class BasicConv(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    class Mixed(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            b = cout // 4
            self.branch1x1 = BasicConv(cin, b, kernel_size=1)
            self.branch5x5 = nn.Sequential(BasicConv(cin, b, kernel_size=1),
                                           BasicConv(b, b, kernel_size=5, padding=2))
            self.branch3x3 = nn.Sequential(BasicConv(cin, b, kernel_size=1),
                                           BasicConv(b, b, kernel_size=3, padding=1))
            self.branch_pool = BasicConv(cin, cout - 3 * b, kernel_size=1)

        def forward(self, x):
            pool = F.avg_pool2d(x, 3, stride=1, padding=1)
            return torch.cat([self.branch1x1(x), self.branch5x5(x),
                              self.branch3x3(x), self.branch_pool(pool)], 1)

    class InceptionAux(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.conv = BasicConv(cin, 4 * c, kernel_size=1)
            self.fc = nn.Linear(4 * c, num_classes)

        def forward(self, x):
            x = F.adaptive_avg_pool2d(self.conv(x), 1).flatten(1)
            return self.fc(x)

    class Inception3(_InceptionBase):
        def __init__(self):
            nn.Module.__init__(self)
            self.stem = nn.Sequential(BasicConv(3, c, kernel_size=3, stride=2),
                                      BasicConv(c, 2 * c, kernel_size=3, stride=2, padding=1),
                                      nn.MaxPool2d(3, stride=2))
            self.mixed1 = Mixed(2 * c, 4 * c)
            self.mixed2 = Mixed(4 * c, 8 * c)
            self.AuxLogits = InceptionAux(8 * c)
            self.mixed3 = Mixed(8 * c, 8 * c)
            self.fc = nn.Linear(8 * c, num_classes)

        def forward(self, x):
            x = self.mixed2(self.mixed1(self.stem(x)))
            aux = self.AuxLogits(x) if self.training else None
            x = self.mixed3(x)
            logits = self.fc(x.mean(dim=(2, 3)))
            return (logits, aux) if self.training else logits

    return Inception3()


def inception_v3(num_classes=1000, w=1.0):
    """Inception-v3 (Szegedy 2016), full torchvision layout: Mixed_5b..7c with
    asymmetric 1x7/7x1 factorized convs, InceptionAux in training mode, 299px
    inputs (the reference special-cases Inception3 at graph.py:325 and
    eval_ghn). Param count (27,161,264 with aux) pinned in tests."""
    torch, nn, F = _torch()
    try:  # subclass torchvision's class so isinstance-gated handling engages
        from torchvision.models import Inception3 as _InceptionBase
    except ImportError:
        _InceptionBase = nn.Module
    c = lambda v: v if w == 1.0 else max(4, int(v * w) // 4 * 4)

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    class InceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, c(64), kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, c(48), kernel_size=1)
            self.branch5x5_2 = BasicConv2d(c(48), c(64), kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, c(64), kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(c(64), c(96), kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(c(96), c(96), kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b5, b3, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, c(384), kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, c(64), kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(c(64), c(96), kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(c(96), c(96), kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, c(192), kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, c(192), kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, c(192), kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, c(192), kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, c(192), kernel_size=1)
            self.branch3x3_2 = BasicConv2d(c(192), c(320), kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, c(192), kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(c(192), c(192), kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(c(192), c(192), kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(c(192), c(192), kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                    self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionE(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, c(320), kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, c(384), kernel_size=1)
            self.branch3x3_2a = BasicConv2d(c(384), c(384), kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(c(384), c(384), kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, c(448), kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(c(448), c(384), kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(c(384), c(384), kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(c(384), c(384), kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, c(192), kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b3, bd, bp], 1)

    class InceptionAux(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.conv0 = BasicConv2d(cin, c(128), kernel_size=1)
            self.conv1 = BasicConv2d(c(128), c(768), kernel_size=5)
            self.fc = nn.Linear(c(768), num_classes)

        def forward(self, x):
            x = F.avg_pool2d(x, 5, stride=3)
            x = self.conv1(self.conv0(x))
            x = F.adaptive_avg_pool2d(x, (1, 1))
            return self.fc(torch.flatten(x, 1))

    class Inception3(_InceptionBase):
        def __init__(self):
            nn.Module.__init__(self)
            self.Conv2d_1a_3x3 = BasicConv2d(3, c(32), kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(c(32), c(32), kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(c(32), c(64), kernel_size=3, padding=1)
            self.maxpool1 = nn.MaxPool2d(3, stride=2)
            self.Conv2d_3b_1x1 = BasicConv2d(c(64), c(80), kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(c(80), c(192), kernel_size=3)
            self.maxpool2 = nn.MaxPool2d(3, stride=2)
            self.Mixed_5b = InceptionA(c(192), c(32))
            self.Mixed_5c = InceptionA(c(64) * 2 + c(96) + c(32), c(64))
            c5 = c(64) * 3 + c(96)
            self.Mixed_5d = InceptionA(c5, c(64))
            self.Mixed_6a = InceptionB(c5)
            c6 = c(384) + c(96) + c5
            self.Mixed_6b = InceptionC(c6, c(128))
            self.Mixed_6c = InceptionC(c6, c(160))
            self.Mixed_6d = InceptionC(c6, c(160))
            self.Mixed_6e = InceptionC(c6, c(192))
            self.AuxLogits = InceptionAux(c6)
            self.Mixed_7a = InceptionD(c6)
            c7a = c(320) + c(192) + c6
            self.Mixed_7b = InceptionE(c7a)
            c7b = c(320) + 2 * c(384) * 2 + c(192)
            self.Mixed_7c = InceptionE(c7b)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.dropout = nn.Dropout(0.5)
            self.fc = nn.Linear(c7b, num_classes)
            self.expected_input_sz = 299

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = self.maxpool1(x)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = self.maxpool2(x)
            x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
            x = self.Mixed_6a(x)
            x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
            aux = self.AuxLogits(x) if self.training else None
            x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
            x = self.dropout(self.avgpool(x))
            logits = self.fc(torch.flatten(x, 1))
            return (logits, aux) if self.training else logits

    return Inception3()


def alexnet(num_classes=1000, w=1.0):
    """AlexNet (Krizhevsky 2012), torchvision layout: features/avgpool/classifier,
    no normalization layers (exercises norm-free conv stacks in the sweep,
    reference eval_ghn.py --split torch)."""
    torch, nn, F = _torch()
    c = lambda v: max(1, int(v * w))

    class AlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, c(64), 11, stride=4, padding=2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, stride=2),
                nn.Conv2d(c(64), c(192), 5, padding=2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, stride=2),
                nn.Conv2d(c(192), c(384), 3, padding=1), nn.ReLU(inplace=True),
                nn.Conv2d(c(384), c(256), 3, padding=1), nn.ReLU(inplace=True),
                nn.Conv2d(c(256), c(256), 3, padding=1), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, stride=2))
            self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
            self.classifier = nn.Sequential(
                nn.Dropout(), nn.Linear(c(256) * 36, c(4096)), nn.ReLU(inplace=True),
                nn.Dropout(), nn.Linear(c(4096), c(4096)), nn.ReLU(inplace=True),
                nn.Linear(c(4096), num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return AlexNet()


def vgg11(num_classes=1000, w=1.0, depth=11):
    """VGG WITHOUT batch norm (torchvision vgg11/13/19): conv/relu/maxpool
    features, 3-layer classifier — the norm-free VGG variants of the sweep."""
    torch, nn, F = _torch()
    c = lambda v: max(1, int(v * w))

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            layers, cin = [], 3
            for v in VGG_CFGS[depth]:
                if v == 'M':
                    layers.append(nn.MaxPool2d(2, stride=2))
                else:
                    layers += [nn.Conv2d(cin, c(v), 3, padding=1), nn.ReLU(inplace=True)]
                    cin = c(v)
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(c(512) * 49, c(4096)), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(c(4096), c(4096)), nn.ReLU(inplace=True), nn.Dropout(),
                nn.Linear(c(4096), num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return VGG()


def googlenet(num_classes=1000, w=1.0):
    """GoogLeNet (Szegedy 2014), torchvision layout with BOTH auxiliary heads
    active in training mode (reference eval_ghn.py:137 passes init_weights=False;
    aux-head parameters are part of the predicted set)."""
    torch, nn, F = _torch()
    c = lambda v: max(2, int(v * w))

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    class Inception(nn.Module):
        def __init__(self, cin, ch1, ch3r, ch3, ch5r, ch5, proj):
            super().__init__()
            self.branch1 = BasicConv2d(cin, ch1, kernel_size=1)
            self.branch2 = nn.Sequential(BasicConv2d(cin, ch3r, kernel_size=1),
                                         BasicConv2d(ch3r, ch3, kernel_size=3, padding=1))
            self.branch3 = nn.Sequential(BasicConv2d(cin, ch5r, kernel_size=1),
                                         BasicConv2d(ch5r, ch5, kernel_size=3, padding=1))
            self.branch4 = nn.Sequential(nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
                                         BasicConv2d(cin, proj, kernel_size=1))

        def forward(self, x):
            return torch.cat([self.branch1(x), self.branch2(x),
                              self.branch3(x), self.branch4(x)], 1)

    class InceptionAux(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.conv = BasicConv2d(cin, c(128), kernel_size=1)
            self.fc1 = nn.Linear(c(128) * 16, c(1024))
            self.fc2 = nn.Linear(c(1024), num_classes)

        def forward(self, x):
            x = F.adaptive_avg_pool2d(x, (4, 4))
            x = torch.flatten(self.conv(x), 1)
            x = F.relu(self.fc1(x), inplace=True)
            return self.fc2(F.dropout(x, 0.7, training=self.training))

    class GoogLeNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = BasicConv2d(3, c(64), kernel_size=7, stride=2, padding=3)
            self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.conv2 = BasicConv2d(c(64), c(64), kernel_size=1)
            self.conv3 = BasicConv2d(c(64), c(192), kernel_size=3, padding=1)
            self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception3a = Inception(c(192), c(64), c(96), c(128), c(16), c(32), c(32))
            self.inception3b = Inception(c(64) + c(128) + c(32) + c(32),
                                         c(128), c(128), c(192), c(32), c(96), c(64))
            self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            c3b = c(128) + c(192) + c(96) + c(64)
            self.inception4a = Inception(c3b, c(192), c(96), c(208), c(16), c(48), c(64))
            c4a = c(192) + c(208) + c(48) + c(64)
            self.inception4b = Inception(c4a, c(160), c(112), c(224), c(24), c(64), c(64))
            c4b = c(160) + c(224) + c(64) + c(64)
            self.inception4c = Inception(c4b, c(128), c(128), c(256), c(24), c(64), c(64))
            c4c = c(128) + c(256) + c(64) + c(64)
            self.inception4d = Inception(c4c, c(112), c(144), c(288), c(32), c(64), c(64))
            c4d = c(112) + c(288) + c(64) + c(64)
            self.inception4e = Inception(c4d, c(256), c(160), c(320), c(32), c(128), c(128))
            c4e = c(256) + c(320) + c(128) + c(128)
            self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
            self.inception5a = Inception(c4e, c(256), c(160), c(320), c(32), c(128), c(128))
            c5a = c(256) + c(320) + c(128) + c(128)
            self.inception5b = Inception(c5a, c(384), c(192), c(384), c(48), c(128), c(128))
            c5b = c(384) + c(384) + c(128) + c(128)
            self.aux1 = InceptionAux(c4a)
            self.aux2 = InceptionAux(c4d)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.dropout = nn.Dropout(0.2)
            self.fc = nn.Linear(c5b, num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.maxpool2(self.conv3(self.conv2(self.maxpool1(self.conv1(x)))))
            x = self.maxpool3(self.inception3b(self.inception3a(x)))
            x = self.inception4a(x)
            aux1 = self.aux1(x) if self.training else None
            x = self.inception4c(self.inception4b(x))
            x = self.inception4d(x)
            aux2 = self.aux2(x) if self.training else None
            x = self.inception4e(x)
            x = self.inception5b(self.inception5a(self.maxpool4(x)))
            x = self.dropout(torch.flatten(self.avgpool(x), 1))
            logits = self.fc(x)
            return (logits, aux2, aux1) if self.training else logits

    return GoogLeNet()


def mnasnet1_0(num_classes=1000, w=1.0):
    """MNASNet (Tan 2018), torchvision layout: one flat `layers` Sequential of
    stem + inverted-residual stacks, then `classifier`. Depths are scaled with
    torchvision's _round_to_multiple_of (divisor 8, 0.9 round-up bias); the
    final 1280 conv is never scaled."""
    torch, nn, F = _torch()

    def c(v):
        if w == 1.0:
            return v
        val = v * w
        new = max(8, int(val + 4) // 8 * 8)
        return new if new >= 0.9 * val else new + 8

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, ks, stride, expansion):
            super().__init__()
            mid = cin * expansion
            self.apply_residual = cin == cout and stride == 1
            self.layers = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
                nn.Conv2d(mid, mid, ks, padding=ks // 2, stride=stride, groups=mid, bias=False),
                nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
                nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout))

        def forward(self, x):
            y = self.layers(x)
            return y + x if self.apply_residual else y

    def stack(cin, cout, ks, stride, expansion, n):
        blocks = [InvertedResidual(cin, cout, ks, stride, expansion)]
        blocks += [InvertedResidual(cout, cout, ks, 1, expansion) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    class MNASNet(nn.Module):
        def __init__(self):
            super().__init__()
            d = [c(32), c(16), c(24), c(40), c(80), c(96), c(192), c(320)]
            self.layers = nn.Sequential(
                nn.Conv2d(3, d[0], 3, padding=1, stride=2, bias=False),
                nn.BatchNorm2d(d[0]), nn.ReLU(inplace=True),
                nn.Conv2d(d[0], d[0], 3, padding=1, groups=d[0], bias=False),
                nn.BatchNorm2d(d[0]), nn.ReLU(inplace=True),
                nn.Conv2d(d[0], d[1], 1, bias=False), nn.BatchNorm2d(d[1]),
                stack(d[1], d[2], 3, 2, 3, 3),
                stack(d[2], d[3], 5, 2, 3, 3),
                stack(d[3], d[4], 5, 2, 6, 3),
                stack(d[4], d[5], 3, 1, 6, 2),
                stack(d[5], d[6], 5, 2, 6, 4),
                stack(d[6], d[7], 3, 1, 6, 1),
                nn.Conv2d(d[7], 1280, 1, bias=False),
                nn.BatchNorm2d(1280), nn.ReLU(inplace=True))
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(1280, num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.layers(x).mean([2, 3])
            return self.classifier(x)

    return MNASNet()


SHUFFLE_STAGES = {'x0_5': (24, 48, 96, 192, 1024),
                  'x1_0': (24, 116, 232, 464, 1024),
                  'x1_5': (24, 176, 352, 704, 1024),
                  'x2_0': (24, 244, 488, 976, 2048)}


def shufflenet_v2_x1_0(num_classes=1000, w=1.0, variant='x1_0'):
    """ShuffleNetV2 (Ma 2018), torchvision layout: channel split (chunk) +
    transpose-based channel shuffle — exercises slice/permute autograd nodes in
    the tracer that no other family hits."""
    torch, nn, F = _torch()
    c = lambda v: max(4, int(v * w) // 2 * 2)

    def channel_shuffle(x, groups):
        b, ch, h, wd = x.size()
        x = x.view(b, groups, ch // groups, h, wd)
        x = torch.transpose(x, 1, 2).contiguous()
        return x.view(b, ch, h, wd)

    class InvertedResidual(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.stride = stride
            branch = cout // 2
            if stride > 1:
                self.branch1 = nn.Sequential(
                    nn.Conv2d(cin, cin, 3, stride=stride, padding=1, groups=cin, bias=False),
                    nn.BatchNorm2d(cin),
                    nn.Conv2d(cin, branch, 1, bias=False),
                    nn.BatchNorm2d(branch), nn.ReLU(inplace=True))
            cin2 = cin if stride > 1 else branch
            self.branch2 = nn.Sequential(
                nn.Conv2d(cin2, branch, 1, bias=False),
                nn.BatchNorm2d(branch), nn.ReLU(inplace=True),
                nn.Conv2d(branch, branch, 3, stride=stride, padding=1, groups=branch, bias=False),
                nn.BatchNorm2d(branch),
                nn.Conv2d(branch, branch, 1, bias=False),
                nn.BatchNorm2d(branch), nn.ReLU(inplace=True))

        def forward(self, x):
            if self.stride == 1:
                x1, x2 = x.chunk(2, dim=1)
                out = torch.cat((x1, self.branch2(x2)), dim=1)
            else:
                out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
            return channel_shuffle(out, 2)

    class ShuffleNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            stages_out = [c(v) for v in SHUFFLE_STAGES[variant]]
            self.conv1 = nn.Sequential(nn.Conv2d(3, stages_out[0], 3, 2, 1, bias=False),
                                       nn.BatchNorm2d(stages_out[0]), nn.ReLU(inplace=True))
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            cin = stages_out[0]
            for i, (cout, repeats) in enumerate(zip(stages_out[1:4], (4, 8, 4))):
                seq = [InvertedResidual(cin, cout, 2)]
                seq += [InvertedResidual(cout, cout, 1) for _ in range(repeats - 1)]
                setattr(self, f'stage{i + 2}', nn.Sequential(*seq))
                cin = cout
            self.conv5 = nn.Sequential(nn.Conv2d(cin, stages_out[4], 1, bias=False),
                                       nn.BatchNorm2d(stages_out[4]), nn.ReLU(inplace=True))
            self.fc = nn.Linear(stages_out[4], num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.maxpool(self.conv1(x))
            x = self.conv5(self.stage4(self.stage3(self.stage2(x))))
            return self.fc(x.mean([2, 3]))

    return ShuffleNetV2()


def regnet(variant='regnet_y_400mf', num_classes=1000, w=1.0):
    """RegNet-X/Y (Radosavovic 2020), torchvision layout: SimpleStemIN +
    trunk_output of ResBottleneckBlocks with grouped 3x3 convs (Y adds
    squeeze-excitation), relu after the residual add. Stage widths/depths come
    from the quantized generator (zoo/configs.py), matching torchvision's
    BlockParams.from_init_params for every released variant."""
    torch, nn, F = _torch()
    from .configs import regnet_config
    widths, depths, gws, use_se = regnet_config(variant, w)
    c = lambda v: max(8, int(v * w) // 8 * 8)

    class SqueezeExcitation(nn.Module):
        def __init__(self, cin, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(cin, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, cin, 1)

        def forward(self, x):
            s = self.fc2(F.relu(self.fc1(self.avgpool(x))))
            return x * torch.sigmoid(s)

    class BottleneckTransform(nn.Module):
        def __init__(self, cin, cout, stride, group_width, se_ratio=0.25):
            super().__init__()
            groups = max(1, cout // group_width)
            self.a = nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                   nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
            self.b = nn.Sequential(nn.Conv2d(cout, cout, 3, stride=stride, padding=1,
                                             groups=groups, bias=False),
                                   nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
            if use_se:
                self.se = SqueezeExcitation(cout, max(1, int(cin * se_ratio)))
            self.c = nn.Sequential(nn.Conv2d(cout, cout, 1, bias=False),
                                   nn.BatchNorm2d(cout))

        def forward(self, x):
            y = self.b(self.a(x))
            if use_se:
                y = self.se(y)
            return self.c(y)

    class ResBottleneckBlock(nn.Module):
        def __init__(self, cin, cout, stride, group_width):
            super().__init__()
            self.proj = None
            if cin != cout or stride != 1:
                self.proj = nn.Sequential(nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                                          nn.BatchNorm2d(cout))
            self.f = BottleneckTransform(cin, cout, stride, group_width)

        def forward(self, x):
            idt = x if self.proj is None else self.proj(x)
            return F.relu(idt + self.f(x))

    class RegNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(nn.Conv2d(3, c(32), 3, stride=2, padding=1, bias=False),
                                      nn.BatchNorm2d(c(32)), nn.ReLU(inplace=True))
            stages = []
            cin = c(32)
            for wd, dep, gw in zip(widths, depths, gws):
                blocks = []
                for j in range(dep):
                    blocks.append(ResBottleneckBlock(cin if j == 0 else wd, wd,
                                                     2 if j == 0 else 1, gw))
                stages.append(nn.Sequential(*blocks))
                cin = wd
            self.trunk_output = nn.Sequential(*stages)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(cin, num_classes)
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.trunk_output(self.stem(x)))
            import torch as _t
            return self.fc(_t.flatten(x, 1))

    return RegNet()


def regnet_y_400mf(num_classes=1000, w=1.0):
    return regnet('regnet_y_400mf', num_classes, w)


def efficientnet_v2_s_ish(num_classes=1000, w=1.0):
    """EfficientNetV2-style (Tan 2021): FusedMBConv stages (fused 3x3 expand)
    followed by MBConv stages with squeeze-excitation — the structural novelty
    vs efficientnet_b0ish is the fused block family."""
    torch, nn, F = _torch()
    c = lambda v: max(4, int(v * w) // 4 * 4)

    class SE(nn.Module):
        def __init__(self, cin, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(cin, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, cin, 1)

        def forward(self, x):
            s = self.fc2(F.silu(self.fc1(self.avgpool(x))))
            return x * torch.sigmoid(s)

    class FusedMBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            mid = cin * expand
            self.use_res = stride == 1 and cin == cout
            block = [nn.Conv2d(cin, mid, 3, stride=stride, padding=1, bias=False),
                     nn.BatchNorm2d(mid), nn.SiLU(inplace=True)]
            if expand != 1:
                block += [nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            else:
                block = [nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                         nn.BatchNorm2d(cout), nn.SiLU(inplace=True)]
            self.block = nn.Sequential(*block)

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            mid = cin * expand
            self.use_res = stride == 1 and cin == cout
            self.block = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.SiLU(inplace=True),
                nn.Conv2d(mid, mid, 3, stride=stride, padding=1, groups=mid, bias=False),
                nn.BatchNorm2d(mid), nn.SiLU(inplace=True),
                SE(mid, max(1, cin // 4)),
                nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout))

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    class EffNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            cfgs = [  # (block, cout, stride, expand, repeats)
                (FusedMBConv, c(24), 1, 1, 2),
                (FusedMBConv, c(48), 2, 4, 2),
                (FusedMBConv, c(64), 2, 4, 2),
                (MBConv, c(128), 2, 4, 2),
                (MBConv, c(160), 1, 6, 2),
                (MBConv, c(256), 2, 6, 2),
            ]
            stages = [nn.Sequential(nn.Conv2d(3, c(24), 3, stride=2, padding=1, bias=False),
                                    nn.BatchNorm2d(c(24)), nn.SiLU(inplace=True))]
            cin = c(24)
            for blk, cout, stride, expand, rep in cfgs:
                blocks = []
                for j in range(rep):
                    blocks.append(blk(cin if j == 0 else cout, cout,
                                      stride if j == 0 else 1, expand))
                stages.append(nn.Sequential(*blocks))
                cin = cout
            stages.append(nn.Sequential(nn.Conv2d(cin, c(1280), 1, bias=False),
                                        nn.BatchNorm2d(c(1280)), nn.SiLU(inplace=True)))
            self.features = nn.Sequential(*stages)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(c(1280), num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return EffNetV2()


def efficientnet_v2(variant='efficientnet_v2_s', num_classes=1000, w=1.0):
    """EfficientNetV2 S/M/L (Tan & Le 2021), torchvision layout: FusedMBConv
    early stages then SE MBConv stages, per-block stochastic-depth ramp.
    Stage tables in zoo/configs.py; param counts pinned in tests."""
    torch, nn, F = _torch()
    from .configs import EFFNET_V2_CFGS
    cfg = EFFNET_V2_CFGS[variant]
    rows, head = cfg['rows'], cfg['head']
    sd_max = {'efficientnet_v2_s': 0.2, 'efficientnet_v2_m': 0.3,
              'efficientnet_v2_l': 0.4}[variant]
    c = lambda v: max(4, int(v * w) // 4 * 4)

    class StochasticDepth(nn.Module):
        def __init__(self, p):
            super().__init__()
            self.p = p

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            noise = torch.empty([x.shape[0], 1, 1, 1], dtype=x.dtype, device=x.device)
            noise.bernoulli_(keep).div_(keep)
            return x * noise

    class SE(nn.Module):
        def __init__(self, cin, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(cin, squeeze, 1)
            self.fc2 = nn.Conv2d(squeeze, cin, 1)

        def forward(self, x):
            s = self.fc2(F.silu(self.fc1(self.avgpool(x))))
            return x * torch.sigmoid(s)

    class FusedMBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand, sd_prob):
            super().__init__()
            mid = cin * expand
            self.use_res = stride == 1 and cin == cout
            if expand != 1:
                block = [nn.Conv2d(cin, mid, 3, stride=stride, padding=1, bias=False),
                         nn.BatchNorm2d(mid), nn.SiLU(inplace=True),
                         nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            else:
                block = [nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                         nn.BatchNorm2d(cout), nn.SiLU(inplace=True)]
            self.block = nn.Sequential(*block)
            self.sd = StochasticDepth(sd_prob)

        def forward(self, x):
            y = self.block(x)
            return x + self.sd(y) if self.use_res else y

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride, expand, sd_prob):
            super().__init__()
            mid = cin * expand
            self.use_res = stride == 1 and cin == cout
            self.block = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.SiLU(inplace=True),
                nn.Conv2d(mid, mid, 3, stride=stride, padding=1, groups=mid, bias=False),
                nn.BatchNorm2d(mid), nn.SiLU(inplace=True),
                SE(mid, max(1, cin // 4)),
                nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout))
            self.sd = StochasticDepth(sd_prob)

        def forward(self, x):
            y = self.block(x)
            return x + self.sd(y) if self.use_res else y

    total_blocks = sum(r[6] for r in rows)

    class EffNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            stem = c(rows[0][4])
            feats = [nn.Conv2d(3, stem, 3, stride=2, padding=1, bias=False),
                     nn.BatchNorm2d(stem), nn.SiLU(inplace=True)]
            block_id = 0
            for kind, t, k, s, cin, cout, n in rows:
                blk = FusedMBConv if kind == 'fused' else MBConv
                for i in range(n):
                    feats.append(blk(c(cin) if i == 0 else c(cout), c(cout),
                                     s if i == 0 else 1, t,
                                     sd_max * block_id / total_blocks))
                    block_id += 1
            feats += [nn.Conv2d(c(rows[-1][5]), c(head), 1, bias=False),
                      nn.BatchNorm2d(c(head)), nn.SiLU(inplace=True)]
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(c(head), num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            return self.classifier(self.features(x).mean(dim=(2, 3)))

    return EffNetV2()


# (cin, exp, cout, kernel, stride, SE, hardswish) rows + (last, hidden)
MNV3_CFGS = {
    'small': ([(16, 16, 16, 3, 2, True, False),
               (16, 72, 24, 3, 2, False, False),
               (24, 88, 24, 3, 1, False, False),
               (24, 96, 40, 5, 2, True, True),
               (40, 240, 40, 5, 1, True, True),
               (40, 240, 40, 5, 1, True, True),
               (40, 120, 48, 5, 1, True, True),
               (48, 144, 48, 5, 1, True, True),
               (48, 288, 96, 5, 2, True, True),
               (96, 576, 96, 5, 1, True, True),
               (96, 576, 96, 5, 1, True, True)], 576, 1024),
    'large': ([(16, 16, 16, 3, 1, False, False),
               (16, 64, 24, 3, 2, False, False),
               (24, 72, 24, 3, 1, False, False),
               (24, 72, 40, 5, 2, True, False),
               (40, 120, 40, 5, 1, True, False),
               (40, 120, 40, 5, 1, True, False),
               (40, 240, 80, 3, 2, False, True),
               (80, 200, 80, 3, 1, False, True),
               (80, 184, 80, 3, 1, False, True),
               (80, 184, 80, 3, 1, False, True),
               (80, 480, 112, 3, 1, True, True),
               (112, 672, 112, 3, 1, True, True),
               (112, 672, 160, 5, 2, True, True),
               (160, 960, 160, 5, 1, True, True),
               (160, 960, 160, 5, 1, True, True)], 960, 1280),
}


def mobilenet_v3_small(num_classes=1000, w=1.0, variant='small'):
    """MobileNetV3 Small/Large (Howard 2019), torchvision layout: inverted
    residuals with hard-sigmoid squeeze-excitation and hardswish/relu
    activation mix — exercises the hardsigmoid autograd path no other family
    hits. Param counts pinned against torchvision in tests."""
    torch, nn, F = _torch()

    def c8(v):
        v = int(v * w)
        return max(8, (v + 4) // 8 * 8)

    class SE(nn.Module):
        def __init__(self, cin):
            super().__init__()
            from .configs import make_divisible
            sq = make_divisible(cin // 4, 8)
            self.fc1 = nn.Conv2d(cin, sq, 1)
            self.fc2 = nn.Conv2d(sq, cin, 1)

        def forward(self, x):
            s = F.adaptive_avg_pool2d(x, 1)
            s = F.hardsigmoid(self.fc2(F.relu(self.fc1(s))))
            return x * s

    class InvertedResidual(nn.Module):
        def __init__(self, cin, exp, cout, k, stride, se, hs):
            super().__init__()
            act = nn.Hardswish if hs else nn.ReLU
            self.use_res = stride == 1 and cin == cout
            block = []
            if exp != cin:
                block += [nn.Conv2d(cin, exp, 1, bias=False), nn.BatchNorm2d(exp),
                          act(inplace=True)]
            block += [nn.Conv2d(exp, exp, k, stride=stride, padding=k // 2,
                                groups=exp, bias=False),
                      nn.BatchNorm2d(exp), act(inplace=True)]
            if se:
                block.append(SE(exp))
            block += [nn.Conv2d(exp, cout, 1, bias=False), nn.BatchNorm2d(cout)]
            self.block = nn.Sequential(*block)

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    cfg, last_c, hidden_c = MNV3_CFGS[variant]

    class MobileNetV3(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [nn.Sequential(nn.Conv2d(3, c8(16), 3, stride=2, padding=1,
                                             bias=False),
                                   nn.BatchNorm2d(c8(16)), nn.Hardswish(inplace=True))]
            for cin, exp, cout, k, s, se, hs in cfg:
                feats.append(InvertedResidual(c8(cin), c8(exp), c8(cout), k, s, se, hs))
            last = c8(last_c)
            feats.append(nn.Sequential(nn.Conv2d(c8(cfg[-1][2]), last, 1, bias=False),
                                       nn.BatchNorm2d(last), nn.Hardswish(inplace=True)))
            self.features = nn.Sequential(*feats)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                nn.Linear(last, c8(hidden_c)), nn.Hardswish(inplace=True),
                nn.Dropout(0.2), nn.Linear(c8(hidden_c), num_classes))
            self.expected_input_sz = 224

        def forward(self, x):
            x = self.avgpool(self.features(x)).flatten(1)
            return self.classifier(x)

    return MobileNetV3()


def swin_t(num_classes=1000, embed_dim=96, depths=(2, 2, 6, 2),
           heads=(3, 6, 12, 24), window=7, mlp_ratio=4.0,
           stochastic_depth_prob=0.2, input_sz=224):
    """Swin-T (Liu 2021), torchvision layout: NHWC stages of shifted-window
    attention blocks with relative position bias, PatchMerging between stages,
    per-block stochastic depth. The class subclasses torchvision's
    SwinTransformer so the reference's Swin-specific edge fixes engage
    (/root/reference/ghn3/graph.py:579-598)."""
    torch, nn, F = _torch()
    try:
        from torchvision.models import SwinTransformer as _SwinBase
    except ImportError:
        _SwinBase = nn.Module

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return x.permute(self.dims)

    class StochasticDepth(nn.Module):
        """Row-mode stochastic depth (torchvision.ops.StochasticDepth)."""

        def __init__(self, p):
            super().__init__()
            self.p = p

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            shape = [x.shape[0]] + [1] * (x.ndim - 1)
            noise = torch.empty(shape, dtype=x.dtype, device=x.device)
            noise.bernoulli_(keep).div_(keep)
            return x * noise

    class ShiftedWindowAttention(nn.Module):
        def __init__(self, dim, num_heads, shift):
            super().__init__()
            self.dim, self.heads, self.shift, self.window = dim, num_heads, shift, window
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * window - 1) ** 2, num_heads))
            coords = torch.stack(torch.meshgrid(torch.arange(window),
                                                torch.arange(window),
                                                indexing='ij')).flatten(1)
            rel = coords[:, :, None] - coords[:, None, :]
            rel = rel.permute(1, 2, 0) + (window - 1)
            idx = rel[..., 0] * (2 * window - 1) + rel[..., 1]
            self.register_buffer('relative_position_index', idx, persistent=False)

        def forward(self, x):
            b, h, w, c = x.shape
            ws, sh = self.window, self.shift
            nh = self.heads
            if sh > 0:
                x = torch.roll(x, shifts=(-sh, -sh), dims=(1, 2))
            nwh, nww = h // ws, w // ws
            xw = x.view(b, nwh, ws, nww, ws, c).permute(0, 1, 3, 2, 4, 5) \
                  .reshape(b * nwh * nww, ws * ws, c)
            qkv = self.qkv(xw).reshape(xw.shape[0], ws * ws, 3, nh, c // nh) \
                              .permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (c // nh) ** -0.5
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)].view(ws * ws, ws * ws, nh)
            attn = attn + bias.permute(2, 0, 1)[None]
            if sh > 0:
                mask = x.new_zeros(h, w)
                slices = ((0, -ws), (-ws, -sh), (-sh, None))
                cnt = 0
                for hs in slices:
                    for vs in slices:
                        mask[hs[0]:hs[1], vs[0]:vs[1]] = cnt
                        cnt += 1
                mw = mask.view(nwh, ws, nww, ws).permute(0, 2, 1, 3) \
                         .reshape(nwh * nww, ws * ws)
                am = mw[:, None, :] - mw[:, :, None]
                am = am.masked_fill(am != 0, -100.0)
                attn = attn.view(b, nwh * nww, nh, ws * ws, ws * ws)
                attn = attn + am[None, :, None]
                attn = attn.view(-1, nh, ws * ws, ws * ws)
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(xw.shape[0], ws * ws, c)
            y = self.proj(y)
            y = y.view(b, nwh, nww, ws, ws, c).permute(0, 1, 3, 2, 4, 5) \
                 .reshape(b, h, w, c)
            if sh > 0:
                y = torch.roll(y, shifts=(sh, sh), dims=(1, 2))
            return y

    class SwinBlock(nn.Module):
        def __init__(self, dim, num_heads, shift, sd_prob):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = ShiftedWindowAttention(dim, num_heads, shift)
            self.stochastic_depth = StochasticDepth(sd_prob)
            self.norm2 = nn.LayerNorm(dim)
            hidden = int(dim * mlp_ratio)
            self.mlp = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0),
                                     nn.Linear(hidden, dim), nn.Dropout(0.0))

        def forward(self, x):
            x = x + self.stochastic_depth(self.attn(self.norm1(x)))
            return x + self.stochastic_depth(self.mlp(self.norm2(x)))

    class PatchMerging(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.norm = nn.LayerNorm(4 * dim)

        def forward(self, x):
            x0 = x[..., 0::2, 0::2, :]
            x1 = x[..., 1::2, 0::2, :]
            x2 = x[..., 0::2, 1::2, :]
            x3 = x[..., 1::2, 1::2, :]
            x = torch.cat([x0, x1, x2, x3], dim=-1)
            return self.reduction(self.norm(x))

    class SwinTransformer(_SwinBase):
        def __init__(self):
            nn.Module.__init__(self)
            total = sum(depths)
            layers = [nn.Sequential(nn.Conv2d(3, embed_dim, 4, stride=4),
                                    Permute([0, 2, 3, 1]), nn.LayerNorm(embed_dim))]
            bid = 0
            dim = embed_dim
            for si, (dep, nh) in enumerate(zip(depths, heads)):
                blocks = []
                for i in range(dep):
                    sd = stochastic_depth_prob * bid / max(1, total - 1)
                    blocks.append(SwinBlock(dim, nh, 0 if i % 2 == 0 else window // 2, sd))
                    bid += 1
                layers.append(nn.Sequential(*blocks))
                if si < len(depths) - 1:
                    layers.append(PatchMerging(dim))
                    dim *= 2
            self.features = nn.Sequential(*layers)
            self.norm = nn.LayerNorm(dim)
            self.permute = Permute([0, 3, 1, 2])
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.flatten = nn.Flatten(1)
            self.head = nn.Linear(dim, num_classes)
            self.expected_input_sz = input_sz

        def forward(self, x):
            x = self.norm(self.features(x))
            x = self.flatten(self.avgpool(self.permute(x)))
            return self.head(x)

    return SwinTransformer()


TORCH_ZOO = {
    'resnet18': resnet18,
    'resnet34': resnet34,
    'resnet50': resnet50,
    'resnet101': resnet101,
    'resnet152': resnet152,
    'wide_resnet50_2': wide_resnet50_2,
    'vit_b_16': vit_b_16,
    'vgg16_bn': vgg16_bn,
    'mobilenet_v2': mobilenet_v2,
    'squeezenet1_1': squeezenet1_1,
    'densenet121': densenet121,
    'efficientnet_b0ish': efficientnet_b0ish,
    'convnext_tiny_ish': convnext_tiny_ish,
    'inception_v3ish': inception_v3ish,
    'alexnet': alexnet,
    'vgg11': vgg11,
    'googlenet': googlenet,
    'mnasnet1_0': mnasnet1_0,
    'shufflenet_v2_x1_0': shufflenet_v2_x1_0,
    'regnet_y_400mf': regnet_y_400mf,
    'efficientnet_v2_s_ish': efficientnet_v2_s_ish,
    'swin_t': swin_t,
    'wide_resnet101_2': wide_resnet101_2,
    'resnext50_32x4d': resnext50_32x4d,
    'resnext101_32x8d': resnext101_32x8d,
    'vgg13_bn': lambda num_classes=1000: vgg16_bn(num_classes, depth=13),
    'vgg19_bn': lambda num_classes=1000: vgg16_bn(num_classes, depth=19),
    'vgg13': lambda num_classes=1000, w=1.0: vgg11(num_classes, w=w, depth=13),
    'vgg19': lambda num_classes=1000, w=1.0: vgg11(num_classes, w=w, depth=19),
    'densenet169': lambda num_classes=1000, growth=32: densenet121(
        num_classes, growth, block_config=(6, 12, 32, 32)),
    'densenet201': lambda num_classes=1000, growth=32: densenet121(
        num_classes, growth, block_config=(6, 12, 48, 32)),
    'shufflenet_v2_x0_5': lambda num_classes=1000, w=1.0: shufflenet_v2_x1_0(
        num_classes, w=w, variant='x0_5'),
    'shufflenet_v2_x2_0': lambda num_classes=1000, w=1.0: shufflenet_v2_x1_0(
        num_classes, w=w, variant='x2_0'),
    'mnasnet0_5': lambda num_classes=1000: mnasnet1_0(num_classes, w=0.5),
    'mnasnet1_3': lambda num_classes=1000: mnasnet1_0(num_classes, w=1.3),
    'vit_b_32': lambda num_classes=1000: vit_b_16(num_classes, patch=32),
    'vit_l_16': lambda num_classes=1000: vit_b_16(num_classes, dim=1024,
                                                  depth=24, heads=16),
    'mobilenet_v3_small': mobilenet_v3_small,
    'mobilenet_v2_x1_4': lambda num_classes=1000: mobilenet_v2(
        num_classes, width_mult=1.4),
}

# Families whose released variants come from shared generator tables
from .configs import REGNET_PARAMS as _REGNET_PARAMS  # noqa: E402
from .configs import EFFICIENTNET_V1_MULTS as _EFF_V1  # noqa: E402
from .configs import EFFNET_V2_CFGS as _EFF_V2  # noqa: E402
from .configs import CONVNEXT_CFGS as _CONVNEXT  # noqa: E402
from .configs import SWIN_CFGS as _SWIN  # noqa: E402

for _v in _REGNET_PARAMS:
    if _v not in TORCH_ZOO:
        TORCH_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                         regnet(_v, num_classes, w))
for _v in _EFF_V1:
    TORCH_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                     efficientnet_v1(_v, num_classes, w))
for _v in _EFF_V2:
    TORCH_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                     efficientnet_v2(_v, num_classes, w))
for _v in _CONVNEXT:
    TORCH_ZOO[_v] = (lambda num_classes=1000, _v=_v:
                     convnext_tiny_ish(num_classes, dims=_CONVNEXT[_v][1],
                                       depths=_CONVNEXT[_v][0]))
for _v in ('swin_s', 'swin_b'):
    TORCH_ZOO[_v] = (lambda num_classes=1000, _v=_v:
                     swin_t(num_classes, embed_dim=_SWIN[_v][0],
                            depths=_SWIN[_v][1], heads=_SWIN[_v][2],
                            stochastic_depth_prob=_SWIN[_v][3]))
del _v

TORCH_ZOO.update({
    'densenet161': lambda num_classes=1000: densenet121(
        num_classes, growth=48, block_config=(6, 12, 36, 24), init_features=96),
    'mobilenet_v3_large': lambda num_classes=1000, w=1.0: mobilenet_v3_small(
        num_classes, w=w, variant='large'),
    'squeezenet1_0': lambda num_classes=1000: squeezenet1_1(
        num_classes, version='1_0'),
    'mnasnet0_75': lambda num_classes=1000: mnasnet1_0(num_classes, w=0.75),
    'resnext101_64x4d': lambda num_classes=1000: _make_resnet(
        'bottleneck', [3, 4, 23, 3], width=4, groups=64, num_classes=num_classes),
    'shufflenet_v2_x1_5': lambda num_classes=1000, w=1.0: shufflenet_v2_x1_0(
        num_classes, w=w, variant='x1_5'),
    'vgg11_bn': lambda num_classes=1000: vgg16_bn(num_classes, depth=11),
    'vgg16': lambda num_classes=1000, w=1.0: vgg11(num_classes, w=w, depth=16),
    'vit_l_32': lambda num_classes=1000: vit_b_16(num_classes, dim=1024,
                                                  depth=24, heads=16, patch=32),
    'inception_v3': inception_v3,
})
