"""Functional JAX twins of the canonical target architectures.

Same parameter names as zoo/torch_zoo.py, so a graph traced from the torch
model maps predicted tensors straight into these nets' param dicts — graphs are
compiled host-side once, while target-net evaluation (the reference's
`infer`/eval_ghn sweep, SURVEY §3.4) runs as jitted TPU programs. BatchNorm uses
batch statistics (the running-stat-free eval mode, reference eval_ghn.py:155-160).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..nets.functional import (AdaptiveAvgPool2d, AvgPool2d, BatchNorm2d, Conv2d,
                               Dropout, FModule, Flatten, GELU, Hardswish,
                               Hardsigmoid, Identity, LayerNorm, Linear,
                               MaxPool2d, ReLU, ReLU6, Sequential, SiLU,
                               adaptive_avg_pool2d)


class _BasicBlock(FModule):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = BatchNorm2d(planes)
        self.conv2 = Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = BatchNorm2d(planes)
        self.downsample = Sequential(
            Conv2d(cin, planes, 1, stride=stride, bias=False),
            BatchNorm2d(planes)) if downsample else None
        if self.downsample is not None:
            self.add('downsample', self.downsample)

    def __call__(self, P, x, prefix='', training=False):
        idt = x if self.downsample is None else \
            self.downsample(P, x, prefix + 'downsample.', training)
        y = jax.nn.relu(self.bn1(P, self.conv1(P, x, prefix + 'conv1.', training),
                                 prefix + 'bn1.', training))
        y = self.bn2(P, self.conv2(P, y, prefix + 'conv2.', training),
                     prefix + 'bn2.', training)
        return jax.nn.relu(y + idt)


class _Bottleneck(FModule):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=False, base_width=64,
                 groups=1):
        super().__init__()
        w = int(planes * (base_width / 64.0)) * groups
        self.conv1 = Conv2d(cin, w, 1, bias=False)
        self.bn1 = BatchNorm2d(w)
        self.conv2 = Conv2d(w, w, 3, stride=stride, padding=1, groups=groups,
                            bias=False)
        self.bn2 = BatchNorm2d(w)
        self.conv3 = Conv2d(w, planes * 4, 1, bias=False)
        self.bn3 = BatchNorm2d(planes * 4)
        self.downsample = Sequential(
            Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
            BatchNorm2d(planes * 4)) if downsample else None
        if self.downsample is not None:
            self.add('downsample', self.downsample)

    def __call__(self, P, x, prefix='', training=False):
        idt = x if self.downsample is None else \
            self.downsample(P, x, prefix + 'downsample.', training)
        y = jax.nn.relu(self.bn1(P, self.conv1(P, x, prefix + 'conv1.', training),
                                 prefix + 'bn1.', training))
        y = jax.nn.relu(self.bn2(P, self.conv2(P, y, prefix + 'conv2.', training),
                                 prefix + 'bn2.', training))
        y = self.bn3(P, self.conv3(P, y, prefix + 'conv3.', training),
                     prefix + 'bn3.', training)
        return jax.nn.relu(y + idt)


class ResNetF(FModule):
    def __init__(self, block: str, layers: Tuple[int, ...], width=64,
                 num_classes=1000, groups=1):
        super().__init__()
        blk = {'basic': _BasicBlock, 'bottleneck': _Bottleneck}[block]
        self._n_cells = 1
        self.expected_input_sz = 224
        self.num_classes = num_classes
        self.conv1 = Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = BatchNorm2d(64)
        self.maxpool = MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), start=1):
            stage = Sequential()
            for j in range(n):
                stride = 2 if (j == 0 and li > 1) else 1
                down = stride != 1 or inplanes != planes * blk.expansion
                kw = {'base_width': width, 'groups': groups} \
                    if blk is _Bottleneck else {}
                stage.append(blk(inplanes, planes, stride, down, **kw))
                inplanes = planes * blk.expansion
            self.add(f'layer{li}', stage)
            setattr(self, f'layer{li}', stage)
        self.fc = Linear(inplanes, num_classes)
        self.predicted: Dict[str, jnp.ndarray] = {}

    def __call__(self, P, x, prefix='', training=False):
        x = self.conv1(P, x, prefix + 'conv1.', training)
        x = jax.nn.relu(self.bn1(P, x, prefix + 'bn1.', training))
        x = self.maxpool(P, x)
        for li in range(1, 5):
            stage = getattr(self, f'layer{li}')
            x = stage(P, x, f'{prefix}layer{li}.', training)
        x = x.mean(axis=(2, 3))
        return self.fc(P, x, prefix + 'fc.', training)

    # GHN target protocol ------------------------------------------------
    def param_shapes(self):
        return {name: shape for name, shape, _ in self.named_params()}

    def param_table(self):
        from ..predict import TargetParam
        self.predicted = {}
        table = [dict()]

        def mk(name):
            def set_fn(tensor, is_weight):
                key = name
                if not is_weight and name.endswith('.weight'):
                    key = name[:-len('.weight')] + '.bias'
                self.predicted[key] = tensor if isinstance(tensor, jnp.ndarray) \
                    else jnp.asarray(tensor)
            return set_fn

        for name, shape, is_w in self.named_params():
            table[0][name] = TargetParam(sz=shape, is_w=is_w, set_fn=mk(name))
        return table


class _MHAF(FModule):
    """``nn.MultiheadAttention`` twin: fused qkv ``in_proj_weight`` /
    ``in_proj_bias`` (the parameter layout the reference maps as a conv node +
    bias node, nn.py:519-520) and ``out_proj``."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.declare('in_proj_weight', (3 * dim, dim), True)
        self.declare('in_proj_bias', (3 * dim,), False)
        self.out_proj = Linear(dim, dim)

    def __call__(self, P, x, prefix='', training=False):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        qkv = x @ self.p(P, prefix, 'in_proj_weight').T \
            + self.p(P, prefix, 'in_proj_bias')
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm', q, k) * (d ** -0.5),
                             axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', att, v).transpose(0, 2, 1, 3)
        return self.out_proj(P, y.reshape(b, n, c), prefix + 'out_proj.', training)


class _ViTEncoderBlockF(FModule):
    """torchvision EncoderBlock twin: ln_1 -> self_attention -> residual,
    ln_2 -> mlp(Linear/GELU/Dropout/Linear/Dropout) -> residual."""

    def __init__(self, dim, heads):
        super().__init__()
        self.ln_1 = LayerNorm(dim, eps=1e-6)
        self.self_attention = _MHAF(dim, heads)
        self.ln_2 = LayerNorm(dim, eps=1e-6)
        self.mlp = Sequential(Linear(dim, dim * 4), GELU(), Dropout(0.0),
                              Linear(dim * 4, dim), Dropout(0.0))

    def __call__(self, P, x, prefix='', training=False):
        y = self.ln_1(P, x, prefix + 'ln_1.', training)
        x = x + self.self_attention(P, y, prefix + 'self_attention.', training)
        y = self.ln_2(P, x, prefix + 'ln_2.', training)
        return x + self.mlp(P, y, prefix + 'mlp.', training)


class ViTF(FModule):
    """Functional twin of the torchvision-exact ViT (zoo/torch_zoo.vit_classes):
    class token + learned ``encoder.pos_embedding`` (class-token row included),
    qkv bias, token-0 classification, torchvision parameter naming.

    ``class_token`` is a bare parameter the GHN never predicts (the reference
    filters its node out, graph.py:658-683); the forward falls back to the
    torchvision zeros init when absent from the param dict."""

    def __init__(self, num_classes=1000, dim=768, depth=12, heads=12, patch=16,
                 img_size=224):
        super().__init__()
        self._n_cells = 1
        self.expected_input_sz = img_size
        self.num_classes = num_classes
        self.dim = dim
        seq_length = (img_size // patch) ** 2 + 1
        self.conv_proj = Conv2d(3, dim, patch, stride=patch, bias=True)
        self.declare('class_token', (1, 1, dim), True)
        encoder = FModule()
        # named so the decode-side lookup key is 'encoder.pos_embedding.weight'
        # (reference _map_net_params appends '.weight' to names without a
        # recognized suffix, nn.py:620-621)
        pos = FModule()
        pos.declare('weight', (1, seq_length, dim), True)
        encoder.add('pos_embedding', pos)
        layers = FModule()
        for i in range(depth):
            layers.add('encoder_layer_%d' % i, _ViTEncoderBlockF(dim, heads))
        encoder.add('layers', layers)
        encoder.add('ln', LayerNorm(dim, eps=1e-6))
        self.add('encoder', encoder)
        self.encoder = encoder
        heads_ = FModule()
        heads_.add('head', Linear(dim, num_classes))
        self.heads = heads_   # __setattr__ registers the 'heads' child
        self.predicted: Dict[str, jnp.ndarray] = {}

    def __call__(self, P, x, prefix='', training=False):
        x = self.conv_proj(P, x, prefix + 'conv_proj.', training)
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        cls = self.p(P, prefix + '', 'class_token')
        if cls is None:  # not GHN-predictable; torchvision initializes to zeros
            cls = jnp.zeros((1, 1, self.dim), x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)), x], axis=1)
        enc = prefix + 'encoder.'
        x = x + self.encoder._children['pos_embedding'].p(
            P, enc + 'pos_embedding.', 'weight')
        layers = self.encoder._children['layers']
        for name, block in layers._children.items():
            x = block(P, x, f'{enc}layers.{name}.', training)
        x = self.encoder._children['ln'](P, x, enc + 'ln.', training)
        return self.heads._children['head'](P, x[:, 0],
                                            prefix + 'heads.head.', training)

    param_shapes = ResNetF.param_shapes
    param_table = ResNetF.param_table


class _Target(FModule):
    """GHN target protocol shared by every functional twin."""
    _n_cells = 1

    param_shapes = ResNetF.param_shapes
    param_table = ResNetF.param_table


def _conv_bn_act(cin, cout, k=3, stride=1, padding=None, groups=1, act='relu'):
    acts = {'relu': ReLU, 'relu6': ReLU6, 'silu': SiLU, None: Identity}
    return Sequential(Conv2d(cin, cout, k, stride=stride,
                             padding=k // 2 if padding is None else padding,
                             groups=groups, bias=False),
                      BatchNorm2d(cout), acts[act]())


class _SeqNet(_Target):
    """features -> avgpool -> flatten -> classifier nets (alexnet, vgg*)."""

    def __init__(self, features, pool_size, classifier, num_classes, input_sz=224):
        super().__init__()
        self.features = features
        self.pool_size = pool_size
        self.classifier = classifier
        self.num_classes = num_classes
        self.expected_input_sz = input_sz
        self.predicted: Dict[str, jnp.ndarray] = {}

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training)
        x = adaptive_avg_pool2d(x, self.pool_size).reshape(x.shape[0], -1)
        return self.classifier(P, x, prefix + 'classifier.', training)


def alexnet_f(num_classes=1000, w=1.0):
    c = lambda v: max(1, int(v * w))
    feats = Sequential(
        Conv2d(3, c(64), 11, stride=4, padding=2), ReLU(), MaxPool2d(3, stride=2),
        Conv2d(c(64), c(192), 5, padding=2), ReLU(), MaxPool2d(3, stride=2),
        Conv2d(c(192), c(384), 3, padding=1), ReLU(),
        Conv2d(c(384), c(256), 3, padding=1), ReLU(),
        Conv2d(c(256), c(256), 3, padding=1), ReLU(), MaxPool2d(3, stride=2))
    cls = Sequential(Dropout(), Linear(c(256) * 36, c(4096)), ReLU(),
                     Dropout(), Linear(c(4096), c(4096)), ReLU(),
                     Linear(c(4096), num_classes))
    return _SeqNet(feats, (6, 6), cls, num_classes)


def vgg11_f(num_classes=1000, w=1.0, depth=11):
    from .torch_zoo import VGG_CFGS
    c = lambda v: max(1, int(v * w))
    layers, cin = [], 3
    for v in VGG_CFGS[depth]:
        if v == 'M':
            layers.append(MaxPool2d(2, stride=2))
        else:
            layers += [Conv2d(cin, c(v), 3, padding=1), ReLU()]
            cin = c(v)
    cls = Sequential(Linear(c(512) * 49, c(4096)), ReLU(), Dropout(),
                     Linear(c(4096), c(4096)), ReLU(), Dropout(),
                     Linear(c(4096), num_classes))
    return _SeqNet(Sequential(*layers), (7, 7), cls, num_classes)


def vgg16_bn_f(num_classes=1000, depth=16):
    from .torch_zoo import VGG_CFGS
    layers, cin = [], 3
    for v in VGG_CFGS[depth]:
        if v == 'M':
            layers.append(MaxPool2d(2, stride=2))
        else:
            layers += [Conv2d(cin, v, 3, padding=1), BatchNorm2d(v), ReLU()]
            cin = v
    cls = Sequential(Linear(512 * 49, 4096), ReLU(), Dropout(),
                     Linear(4096, 4096), ReLU(), Dropout(),
                     Linear(4096, num_classes))
    return _SeqNet(Sequential(*layers), (7, 7), cls, num_classes)


class _InvertedResidualV2(FModule):
    """MobileNetV2 inverted residual: conv Sequential named 'conv'."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = int(round(cin * expand))
        self.use_res = stride == 1 and cin == cout
        mods = []
        if expand != 1:
            mods.append(_conv_bn_act(cin, hidden, k=1, act='relu6'))
        mods += [_conv_bn_act(hidden, hidden, stride=stride, groups=hidden, act='relu6'),
                 Conv2d(hidden, cout, 1, bias=False), BatchNorm2d(cout)]
        self.conv = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.conv(P, x, prefix + 'conv.', training)
        return x + y if self.use_res else y


class MobileNetV2F(_Target):
    def __init__(self, num_classes=1000, width_mult=1.0):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}

        def c_round(c):
            c = int(c * width_mult)
            return max(8, (c + 4) // 8 * 8)

        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        cin = c_round(32)
        feats = [_conv_bn_act(3, cin, stride=2, act='relu6')]
        for t, c, n, s in cfg:
            cout = c_round(c)
            for i in range(n):
                feats.append(_InvertedResidualV2(cin, cout, s if i == 0 else 1, t))
                cin = cout
        last = c_round(1280)
        feats.append(_conv_bn_act(cin, last, k=1, act='relu6'))
        self.features = Sequential(*feats)
        self.classifier = Sequential(Dropout(0.2), Linear(last, num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


class _Fire(FModule):
    def __init__(self, cin, squeeze, e1, e3):
        super().__init__()
        self.squeeze = Conv2d(cin, squeeze, 1)
        self.expand1x1 = Conv2d(squeeze, e1, 1)
        self.expand3x3 = Conv2d(squeeze, e3, 3, padding=1)

    def __call__(self, P, x, prefix='', training=False):
        x = jax.nn.relu(self.squeeze(P, x, prefix + 'squeeze.', training))
        return jnp.concatenate(
            [jax.nn.relu(self.expand1x1(P, x, prefix + 'expand1x1.', training)),
             jax.nn.relu(self.expand3x3(P, x, prefix + 'expand3x3.', training))], axis=1)


class SqueezeNetF(_Target):
    def __init__(self, num_classes=1000, version='1_1'):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        if version == '1_0':
            self.features = Sequential(
                Conv2d(3, 96, 7, stride=2), ReLU(),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(96, 16, 64, 64), _Fire(128, 16, 64, 64),
                _Fire(128, 32, 128, 128),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(256, 32, 128, 128), _Fire(256, 48, 192, 192),
                _Fire(384, 48, 192, 192), _Fire(384, 64, 256, 256),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(512, 64, 256, 256))
        else:
            self.features = Sequential(
                Conv2d(3, 64, 3, stride=2), ReLU(),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
                MaxPool2d(3, stride=2, ceil_mode=True),
                _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
                _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256))
        self.classifier = Sequential(Dropout(0.5), Conv2d(512, num_classes, 1), ReLU())

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training)
        x = self.classifier(P, x, prefix + 'classifier.', training)
        return x.mean(axis=(2, 3))


class _DenseLayer(FModule):
    def __init__(self, cin, growth):
        super().__init__()
        self.norm1 = BatchNorm2d(cin)
        self.conv1 = Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = BatchNorm2d(4 * growth)
        self.conv2 = Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def __call__(self, P, x, prefix='', training=False):
        y = self.conv1(P, jax.nn.relu(self.norm1(P, x, prefix + 'norm1.', training)),
                       prefix + 'conv1.', training)
        return self.conv2(P, jax.nn.relu(self.norm2(P, y, prefix + 'norm2.', training)),
                          prefix + 'conv2.', training)


class _DenseBlock(FModule):
    def __init__(self, cin, n, growth):
        super().__init__()
        layers = FModule()
        self.layer_list = []
        for i in range(n):
            lyr = _DenseLayer(cin + i * growth, growth)
            layers.add(str(i), lyr)
            self.layer_list.append(lyr)
        self.add('layers', layers)
        self.layers = layers

    def __call__(self, P, x, prefix='', training=False):
        feats = [x]
        for i, lyr in enumerate(self.layer_list):
            inp = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]
            feats.append(lyr(P, inp, f'{prefix}layers.{i}.', training))
        return jnp.concatenate(feats, axis=1)


class DenseNetF(_Target):
    def __init__(self, num_classes=1000, growth=32, block_config=(6, 12, 24, 16),
                 init_features=64):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        c = init_features
        feats = [Conv2d(3, c, 7, stride=2, padding=3, bias=False),
                 BatchNorm2d(c), ReLU(), MaxPool2d(3, stride=2, padding=1)]
        for i, n in enumerate(block_config):
            feats.append(_DenseBlock(c, n, growth))
            c += n * growth
            if i < len(block_config) - 1:
                feats.append(Sequential(BatchNorm2d(c), ReLU(),
                                        Conv2d(c, c // 2, 1, bias=False),
                                        AvgPool2d(2, stride=2)))
                c //= 2
        feats.append(BatchNorm2d(c))
        self.features = Sequential(*feats)
        self.classifier = Linear(c, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = jax.nn.relu(self.features(P, x, prefix + 'features.', training))
        return self.classifier(P, x.mean(axis=(2, 3)), prefix + 'classifier.', training)


class _SEBlock(FModule):
    """Squeeze-excite with conv 1x1 fcs (efficientnet/regnet style)."""

    def __init__(self, cin, squeeze, act='silu', pooled=False):
        super().__init__()
        self.fc1 = Conv2d(cin, squeeze, 1)
        self.fc2 = Conv2d(squeeze, cin, 1)
        self.act = act
        self.pooled = pooled
        if pooled:
            self.avgpool = AdaptiveAvgPool2d(1)

    def __call__(self, P, x, prefix='', training=False):
        s = x.mean(axis=(2, 3), keepdims=True)
        s = self.fc1(P, s, prefix + 'fc1.', training)
        s = jax.nn.silu(s) if self.act == 'silu' else jax.nn.relu(s)
        s = self.fc2(P, s, prefix + 'fc2.', training)
        return x * jax.nn.sigmoid(s)


class _MBConv(FModule):
    """EfficientNet MBConv: flat 'block' Sequential (matches torch_zoo)."""

    def __init__(self, cin, cout, stride, expand, k=3):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        mods = []
        if expand != 1:
            mods += [Conv2d(cin, hidden, 1, bias=False), BatchNorm2d(hidden), SiLU()]
        mods += [Conv2d(hidden, hidden, k, stride=stride, padding=k // 2,
                        groups=hidden, bias=False),
                 BatchNorm2d(hidden), SiLU(),
                 _SEBlock(hidden, max(1, hidden // (4 * expand) if expand != 1
                                      else hidden // 4)),
                 Conv2d(hidden, cout, 1, bias=False), BatchNorm2d(cout)]
        self.block = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class EffNetB0F(_Target):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        cfg = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
               (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]
        feats = [Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
                 BatchNorm2d(32), SiLU()]
        cin = 32
        for t, c, n, s, k in cfg:
            for i in range(n):
                feats.append(_MBConv(cin, c, s if i == 0 else 1, t, k))
                cin = c
        feats += [Conv2d(cin, 1280, 1, bias=False), BatchNorm2d(1280), SiLU()]
        self.features = Sequential(*feats)
        self.classifier = Linear(1280, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


class _MBConvV1(FModule):
    """Exact torchvision MBConv: SE squeeze from the UNexpanded block input;
    stochastic depth is identity at inference (eval twins)."""

    def __init__(self, cin, cout, stride, expand, k):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        mods = []
        if expand != 1:
            mods += [Conv2d(cin, hidden, 1, bias=False), BatchNorm2d(hidden), SiLU()]
        mods += [Conv2d(hidden, hidden, k, stride=stride, padding=k // 2,
                        groups=hidden, bias=False),
                 BatchNorm2d(hidden), SiLU(),
                 _SEBlock(hidden, max(1, cin // 4)),
                 Conv2d(hidden, cout, 1, bias=False), BatchNorm2d(cout)]
        self.block = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class EffNetV1F(_Target):
    """Twin of torch_zoo.efficientnet_v1 (B0-B7 compound scaling)."""

    def __init__(self, num_classes=1000, w=1.0, variant='efficientnet_b0'):
        super().__init__()
        from .configs import efficientnet_v1_config
        stem, rows, head = efficientnet_v1_config(variant, w)
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        feats = [Conv2d(3, stem, 3, stride=2, padding=1, bias=False),
                 BatchNorm2d(stem), SiLU()]
        for t, k, s, cin, cout, n in rows:
            for i in range(n):
                feats.append(_MBConvV1(cin if i == 0 else cout, cout,
                                       s if i == 0 else 1, t, k))
        feats += [Conv2d(rows[-1][4], head, 1, bias=False), BatchNorm2d(head), SiLU()]
        self.features = Sequential(*feats)
        self.classifier = Sequential(Dropout(0.2), Linear(head, num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


class _LayerNorm2d(LayerNorm):
    def __call__(self, P, x, prefix='', training=False):
        x = x.transpose(0, 2, 3, 1)
        x = super().__call__(P, x, prefix, training)
        return x.transpose(0, 3, 1, 2)


class _ConvNeXtBlock(FModule):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.dwconv = Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = LayerNorm(dim)
        self.pwconv1 = Linear(dim, 4 * dim)
        self.pwconv2 = Linear(4 * dim, dim)
        self.declare('layer_scale', (dim,), True)

    def __call__(self, P, x, prefix='', training=False):
        y = self.dwconv(P, x, prefix + 'dwconv.', training).transpose(0, 2, 3, 1)
        y = self.norm(P, y, prefix + 'norm.', training)
        y = self.pwconv1(P, y, prefix + 'pwconv1.', training)
        y = self.pwconv2(P, jax.nn.gelu(y, approximate=False),
                         prefix + 'pwconv2.', training)
        # layer_scale is a bare parameter the GHN does not predict (reference
        # leaves it at its 1e-6 init) — fall back to the init constant
        scale = self.p(P, prefix, 'layer_scale')
        if scale is None:
            scale = 1e-6 * jnp.ones((self.dim,), x.dtype)
        return x + (scale * y).transpose(0, 3, 1, 2)


class ConvNeXtF(_Target):
    def __init__(self, num_classes=1000, dims=(96, 192, 384, 768), depths=(2, 2, 4, 2)):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        stages = [Conv2d(3, dims[0], 4, stride=4), _LayerNorm2d(dims[0])]
        for i, (d, n) in enumerate(zip(dims, depths)):
            if i > 0:
                stages += [_LayerNorm2d(dims[i - 1]),
                           Conv2d(dims[i - 1], d, 2, stride=2)]
            stages += [_ConvNeXtBlock(d) for _ in range(n)]
        self.features = Sequential(*stages)
        self.norm = LayerNorm(dims[-1])
        self.head = Linear(dims[-1], num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        x = self.norm(P, x, prefix + 'norm.', training)
        return self.head(P, x, prefix + 'head.', training)


class _BasicConvBN(FModule):
    """conv (bias-free) + bn, named conv/bn (inception/googlenet BasicConv)."""

    def __init__(self, cin, cout, eps=1e-5, **kw):
        super().__init__()
        self.conv = Conv2d(cin, cout, bias=False, **kw)
        self.bn = BatchNorm2d(cout, eps=eps)

    def __call__(self, P, x, prefix='', training=False):
        y = self.conv(P, x, prefix + 'conv.', training)
        return jax.nn.relu(self.bn(P, y, prefix + 'bn.', training))


class _IncMixed(FModule):
    def __init__(self, cin, cout):
        super().__init__()
        b = cout // 4
        self.branch1x1 = _BasicConvBN(cin, b, kernel_size=1)
        self.branch5x5 = Sequential(_BasicConvBN(cin, b, kernel_size=1),
                                    _BasicConvBN(b, b, kernel_size=5, padding=2))
        self.branch3x3 = Sequential(_BasicConvBN(cin, b, kernel_size=1),
                                    _BasicConvBN(b, b, kernel_size=3, padding=1))
        self.branch_pool = _BasicConvBN(cin, cout - 3 * b, kernel_size=1)

    def __call__(self, P, x, prefix='', training=False):
        from ..nets.functional import _pool
        pool = _pool(x, 'avg', 3, 1, 1)
        return jnp.concatenate(
            [self.branch1x1(P, x, prefix + 'branch1x1.', training),
             self.branch5x5(P, x, prefix + 'branch5x5.', training),
             self.branch3x3(P, x, prefix + 'branch3x3.', training),
             self.branch_pool(P, pool, prefix + 'branch_pool.', training)], axis=1)


class InceptionV3F(_Target):
    def __init__(self, num_classes=1000, c=32):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = 299
        self.predicted: Dict[str, jnp.ndarray] = {}
        self.stem = Sequential(_BasicConvBN(3, c, kernel_size=3, stride=2),
                               _BasicConvBN(c, 2 * c, kernel_size=3, stride=2, padding=1),
                               MaxPool2d(3, stride=2))
        self.mixed1 = _IncMixed(2 * c, 4 * c)
        self.mixed2 = _IncMixed(4 * c, 8 * c)
        aux = FModule()
        aux.add('conv', _BasicConvBN(8 * c, 4 * c, kernel_size=1))
        aux.add('fc', Linear(4 * c, num_classes))
        self.AuxLogits = aux
        self.mixed3 = _IncMixed(8 * c, 8 * c)
        self.fc = Linear(8 * c, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.stem(P, x, prefix + 'stem.', training)
        x = self.mixed2(P, self.mixed1(P, x, prefix + 'mixed1.', training),
                        prefix + 'mixed2.', training)
        aux = None
        if training:
            a = self.AuxLogits._children['conv'](P, x, prefix + 'AuxLogits.conv.',
                                                 training)
            a = a.mean(axis=(2, 3))
            aux = self.AuxLogits._children['fc'](P, a, prefix + 'AuxLogits.fc.',
                                                 training)
        x = self.mixed3(P, x, prefix + 'mixed3.', training)
        logits = self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)
        return (logits, aux) if training else logits


class _IncA(FModule):
    def __init__(self, cin, pool_features, c):
        super().__init__()
        self.branch1x1 = _BasicConvBN(cin, c(64), eps=0.001, kernel_size=1)
        self.branch5x5_1 = _BasicConvBN(cin, c(48), eps=0.001, kernel_size=1)
        self.branch5x5_2 = _BasicConvBN(c(48), c(64), eps=0.001, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConvBN(cin, c(64), eps=0.001, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConvBN(c(64), c(96), eps=0.001, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConvBN(c(96), c(96), eps=0.001, kernel_size=3, padding=1)
        self.branch_pool = _BasicConvBN(cin, pool_features, eps=0.001, kernel_size=1)
        self._avg = AvgPool2d(3, stride=1, padding=1)

    def __call__(self, P, x, prefix='', training=False):
        b1 = self.branch1x1(P, x, prefix + 'branch1x1.', training)
        b5 = self.branch5x5_2(P, self.branch5x5_1(P, x, prefix + 'branch5x5_1.', training),
                              prefix + 'branch5x5_2.', training)
        bd = self.branch3x3dbl_3(P, self.branch3x3dbl_2(
            P, self.branch3x3dbl_1(P, x, prefix + 'branch3x3dbl_1.', training),
            prefix + 'branch3x3dbl_2.', training), prefix + 'branch3x3dbl_3.', training)
        bp = self.branch_pool(P, self._avg(P, x), prefix + 'branch_pool.', training)
        return jnp.concatenate([b1, b5, bd, bp], axis=1)


class _IncB(FModule):
    def __init__(self, cin, c):
        super().__init__()
        self.branch3x3 = _BasicConvBN(cin, c(384), eps=0.001, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConvBN(cin, c(64), eps=0.001, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConvBN(c(64), c(96), eps=0.001, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConvBN(c(96), c(96), eps=0.001, kernel_size=3, stride=2)
        self._max = MaxPool2d(3, stride=2)

    def __call__(self, P, x, prefix='', training=False):
        return jnp.concatenate([
            self.branch3x3(P, x, prefix + 'branch3x3.', training),
            self.branch3x3dbl_3(P, self.branch3x3dbl_2(
                P, self.branch3x3dbl_1(P, x, prefix + 'branch3x3dbl_1.', training),
                prefix + 'branch3x3dbl_2.', training), prefix + 'branch3x3dbl_3.', training),
            self._max(P, x)], axis=1)


class _IncC(FModule):
    def __init__(self, cin, c7, c):
        super().__init__()
        self.branch1x1 = _BasicConvBN(cin, c(192), eps=0.001, kernel_size=1)
        self.branch7x7_1 = _BasicConvBN(cin, c7, eps=0.001, kernel_size=1)
        self.branch7x7_2 = _BasicConvBN(c7, c7, eps=0.001, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConvBN(c7, c(192), eps=0.001, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConvBN(cin, c7, eps=0.001, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConvBN(c7, c7, eps=0.001, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConvBN(c7, c7, eps=0.001, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConvBN(c7, c7, eps=0.001, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConvBN(c7, c(192), eps=0.001, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConvBN(cin, c(192), eps=0.001, kernel_size=1)
        self._avg = AvgPool2d(3, stride=1, padding=1)

    def __call__(self, P, x, prefix='', training=False):
        b1 = self.branch1x1(P, x, prefix + 'branch1x1.', training)
        b7 = self.branch7x7_3(P, self.branch7x7_2(
            P, self.branch7x7_1(P, x, prefix + 'branch7x7_1.', training),
            prefix + 'branch7x7_2.', training), prefix + 'branch7x7_3.', training)
        bd = x
        for i in range(1, 6):
            bd = getattr(self, 'branch7x7dbl_%d' % i)(
                P, bd, prefix + 'branch7x7dbl_%d.' % i, training)
        bp = self.branch_pool(P, self._avg(P, x), prefix + 'branch_pool.', training)
        return jnp.concatenate([b1, b7, bd, bp], axis=1)


class _IncD(FModule):
    def __init__(self, cin, c):
        super().__init__()
        self.branch3x3_1 = _BasicConvBN(cin, c(192), eps=0.001, kernel_size=1)
        self.branch3x3_2 = _BasicConvBN(c(192), c(320), eps=0.001, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConvBN(cin, c(192), eps=0.001, kernel_size=1)
        self.branch7x7x3_2 = _BasicConvBN(c(192), c(192), eps=0.001, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BasicConvBN(c(192), c(192), eps=0.001, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BasicConvBN(c(192), c(192), eps=0.001, kernel_size=3, stride=2)
        self._max = MaxPool2d(3, stride=2)

    def __call__(self, P, x, prefix='', training=False):
        b3 = self.branch3x3_2(P, self.branch3x3_1(P, x, prefix + 'branch3x3_1.', training),
                              prefix + 'branch3x3_2.', training)
        bd = x
        for i in range(1, 5):
            bd = getattr(self, 'branch7x7x3_%d' % i)(
                P, bd, prefix + 'branch7x7x3_%d.' % i, training)
        return jnp.concatenate([b3, bd, self._max(P, x)], axis=1)


class _IncE(FModule):
    def __init__(self, cin, c):
        super().__init__()
        self.branch1x1 = _BasicConvBN(cin, c(320), eps=0.001, kernel_size=1)
        self.branch3x3_1 = _BasicConvBN(cin, c(384), eps=0.001, kernel_size=1)
        self.branch3x3_2a = _BasicConvBN(c(384), c(384), eps=0.001, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConvBN(c(384), c(384), eps=0.001, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConvBN(cin, c(448), eps=0.001, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConvBN(c(448), c(384), eps=0.001, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConvBN(c(384), c(384), eps=0.001, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConvBN(c(384), c(384), eps=0.001, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConvBN(cin, c(192), eps=0.001, kernel_size=1)
        self._avg = AvgPool2d(3, stride=1, padding=1)

    def __call__(self, P, x, prefix='', training=False):
        b1 = self.branch1x1(P, x, prefix + 'branch1x1.', training)
        b3 = self.branch3x3_1(P, x, prefix + 'branch3x3_1.', training)
        b3 = jnp.concatenate([self.branch3x3_2a(P, b3, prefix + 'branch3x3_2a.', training),
                              self.branch3x3_2b(P, b3, prefix + 'branch3x3_2b.', training)],
                             axis=1)
        bd = self.branch3x3dbl_2(P, self.branch3x3dbl_1(
            P, x, prefix + 'branch3x3dbl_1.', training), prefix + 'branch3x3dbl_2.', training)
        bd = jnp.concatenate([self.branch3x3dbl_3a(P, bd, prefix + 'branch3x3dbl_3a.', training),
                              self.branch3x3dbl_3b(P, bd, prefix + 'branch3x3dbl_3b.', training)],
                             axis=1)
        bp = self.branch_pool(P, self._avg(P, x), prefix + 'branch_pool.', training)
        return jnp.concatenate([b1, b3, bd, bp], axis=1)


class _IncV3Aux(FModule):
    def __init__(self, cin, num_classes, c):
        super().__init__()
        self.conv0 = _BasicConvBN(cin, c(128), eps=0.001, kernel_size=1)
        self.conv1 = _BasicConvBN(c(128), c(768), eps=0.001, kernel_size=5)
        self.fc = Linear(c(768), num_classes)
        self._avg = AvgPool2d(5, stride=3)

    def __call__(self, P, x, prefix='', training=False):
        x = self._avg(P, x)
        x = self.conv1(P, self.conv0(P, x, prefix + 'conv0.', training),
                       prefix + 'conv1.', training)
        return self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)


class InceptionV3ExactF(_Target):
    """Twin of torch_zoo.inception_v3 (full torchvision Mixed_5b..7c layout)."""

    def __init__(self, num_classes=1000, w=1.0):
        super().__init__()
        c = lambda v: v if w == 1.0 else max(4, int(v * w) // 4 * 4)
        self.num_classes = num_classes
        self.expected_input_sz = 299
        self.predicted: Dict[str, jnp.ndarray] = {}
        self.Conv2d_1a_3x3 = _BasicConvBN(3, c(32), eps=0.001, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConvBN(c(32), c(32), eps=0.001, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConvBN(c(32), c(64), eps=0.001, kernel_size=3, padding=1)
        self.maxpool1 = MaxPool2d(3, stride=2)
        self.Conv2d_3b_1x1 = _BasicConvBN(c(64), c(80), eps=0.001, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConvBN(c(80), c(192), eps=0.001, kernel_size=3)
        self.maxpool2 = MaxPool2d(3, stride=2)
        self.Mixed_5b = _IncA(c(192), c(32), c)
        self.Mixed_5c = _IncA(c(64) * 2 + c(96) + c(32), c(64), c)
        c5 = c(64) * 3 + c(96)
        self.Mixed_5d = _IncA(c5, c(64), c)
        self.Mixed_6a = _IncB(c5, c)
        c6 = c(384) + c(96) + c5
        self.Mixed_6b = _IncC(c6, c(128), c)
        self.Mixed_6c = _IncC(c6, c(160), c)
        self.Mixed_6d = _IncC(c6, c(160), c)
        self.Mixed_6e = _IncC(c6, c(192), c)
        self.AuxLogits = _IncV3Aux(c6, num_classes, c)
        self.Mixed_7a = _IncD(c6, c)
        c7a = c(320) + c(192) + c6
        self.Mixed_7b = _IncE(c7a, c)
        c7b = c(320) + 2 * c(384) * 2 + c(192)
        self.Mixed_7c = _IncE(c7b, c)
        self.fc = Linear(c7b, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        for name in ('Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3'):
            x = getattr(self, name)(P, x, prefix + name + '.', training)
        x = self.maxpool1(P, x)
        x = self.Conv2d_4a_3x3(P, self.Conv2d_3b_1x1(
            P, x, prefix + 'Conv2d_3b_1x1.', training), prefix + 'Conv2d_4a_3x3.', training)
        x = self.maxpool2(P, x)
        for name in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d', 'Mixed_6a',
                     'Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e'):
            x = getattr(self, name)(P, x, prefix + name + '.', training)
        aux = (self.AuxLogits(P, x, prefix + 'AuxLogits.', training)
               if training else None)
        for name in ('Mixed_7a', 'Mixed_7b', 'Mixed_7c'):
            x = getattr(self, name)(P, x, prefix + name + '.', training)
        logits = self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)
        return (logits, aux) if training else logits


class _GoogAux(FModule):
    def __init__(self, cin, c128, c1024, num_classes):
        super().__init__()
        self.conv = _BasicConvBN(cin, c128, eps=0.001, kernel_size=1)
        self.fc1 = Linear(c128 * 16, c1024)
        self.fc2 = Linear(c1024, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = adaptive_avg_pool2d(x, (4, 4))
        x = self.conv(P, x, prefix + 'conv.', training).reshape(x.shape[0], -1)
        x = jax.nn.relu(self.fc1(P, x, prefix + 'fc1.', training))
        return self.fc2(P, x, prefix + 'fc2.', training)


class _GoogInception(FModule):
    def __init__(self, cin, ch1, ch3r, ch3, ch5r, ch5, proj):
        super().__init__()
        bc = lambda ci, co, **kw: _BasicConvBN(ci, co, eps=0.001, **kw)
        self.branch1 = bc(cin, ch1, kernel_size=1)
        self.branch2 = Sequential(bc(cin, ch3r, kernel_size=1),
                                  bc(ch3r, ch3, kernel_size=3, padding=1))
        self.branch3 = Sequential(bc(cin, ch5r, kernel_size=1),
                                  bc(ch5r, ch5, kernel_size=3, padding=1))
        self.branch4 = Sequential(MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
                                  bc(cin, proj, kernel_size=1))

    def __call__(self, P, x, prefix='', training=False):
        return jnp.concatenate(
            [self.branch1(P, x, prefix + 'branch1.', training),
             self.branch2(P, x, prefix + 'branch2.', training),
             self.branch3(P, x, prefix + 'branch3.', training),
             self.branch4(P, x, prefix + 'branch4.', training)], axis=1)


class GoogLeNetF(_Target):
    def __init__(self, num_classes=1000, w=1.0):
        super().__init__()
        c = lambda v: max(2, int(v * w))
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        bc = lambda ci, co, **kw: _BasicConvBN(ci, co, eps=0.001, **kw)
        self.conv1 = bc(3, c(64), kernel_size=7, stride=2, padding=3)
        self.maxpool1 = MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = bc(c(64), c(64), kernel_size=1)
        self.conv3 = bc(c(64), c(192), kernel_size=3, padding=1)
        self.maxpool2 = MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception3a = _GoogInception(c(192), c(64), c(96), c(128), c(16), c(32), c(32))
        self.inception3b = _GoogInception(c(64) + c(128) + c(32) + c(32),
                                          c(128), c(128), c(192), c(32), c(96), c(64))
        self.maxpool3 = MaxPool2d(3, stride=2, ceil_mode=True)
        c3b = c(128) + c(192) + c(96) + c(64)
        self.inception4a = _GoogInception(c3b, c(192), c(96), c(208), c(16), c(48), c(64))
        c4a = c(192) + c(208) + c(48) + c(64)
        self.inception4b = _GoogInception(c4a, c(160), c(112), c(224), c(24), c(64), c(64))
        c4b = c(160) + c(224) + c(64) + c(64)
        self.inception4c = _GoogInception(c4b, c(128), c(128), c(256), c(24), c(64), c(64))
        c4c = c(128) + c(256) + c(64) + c(64)
        self.inception4d = _GoogInception(c4c, c(112), c(144), c(288), c(32), c(64), c(64))
        c4d = c(112) + c(288) + c(64) + c(64)
        self.inception4e = _GoogInception(c4d, c(256), c(160), c(320), c(32), c(128), c(128))
        c4e = c(256) + c(320) + c(128) + c(128)
        self.maxpool4 = MaxPool2d(2, stride=2, ceil_mode=True)
        self.inception5a = _GoogInception(c4e, c(256), c(160), c(320), c(32), c(128), c(128))
        c5a = c(256) + c(320) + c(128) + c(128)
        self.inception5b = _GoogInception(c5a, c(384), c(192), c(384), c(48), c(128), c(128))
        c5b = c(384) + c(384) + c(128) + c(128)
        self.aux1 = _GoogAux(c4a, c(128), c(1024), num_classes)
        self.aux2 = _GoogAux(c4d, c(128), c(1024), num_classes)
        self.fc = Linear(c5b, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.conv1(P, x, prefix + 'conv1.', training)
        x = self.maxpool1(P, x)
        x = self.conv3(P, self.conv2(P, x, prefix + 'conv2.', training),
                       prefix + 'conv3.', training)
        x = self.maxpool2(P, x)
        x = self.inception3b(P, self.inception3a(P, x, prefix + 'inception3a.', training),
                             prefix + 'inception3b.', training)
        x = self.maxpool3(P, x)
        x = self.inception4a(P, x, prefix + 'inception4a.', training)
        aux1 = self.aux1(P, x, prefix + 'aux1.', training) if training else None
        x = self.inception4b(P, x, prefix + 'inception4b.', training)
        x = self.inception4c(P, x, prefix + 'inception4c.', training)
        x = self.inception4d(P, x, prefix + 'inception4d.', training)
        aux2 = self.aux2(P, x, prefix + 'aux2.', training) if training else None
        x = self.inception4e(P, x, prefix + 'inception4e.', training)
        x = self.inception5a(P, self.maxpool4(P, x), prefix + 'inception5a.', training)
        x = self.inception5b(P, x, prefix + 'inception5b.', training)
        logits = self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)
        return (logits, aux2, aux1) if training else logits


class _MNASInverted(FModule):
    def __init__(self, cin, cout, ks, stride, expansion):
        super().__init__()
        mid = cin * expansion
        self.apply_residual = cin == cout and stride == 1
        self.layers = Sequential(
            Conv2d(cin, mid, 1, bias=False), BatchNorm2d(mid), ReLU(),
            Conv2d(mid, mid, ks, padding=ks // 2, stride=stride, groups=mid, bias=False),
            BatchNorm2d(mid), ReLU(),
            Conv2d(mid, cout, 1, bias=False), BatchNorm2d(cout))

    def __call__(self, P, x, prefix='', training=False):
        y = self.layers(P, x, prefix + 'layers.', training)
        return y + x if self.apply_residual else y


class MNASNetF(_Target):
    def __init__(self, num_classes=1000, w=1.0):
        super().__init__()

        def c(v):
            if w == 1.0:
                return v
            val = v * w
            new = max(8, int(val + 4) // 8 * 8)
            return new if new >= 0.9 * val else new + 8
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}

        def stack(cin, cout, ks, stride, expansion, n):
            blocks = [_MNASInverted(cin, cout, ks, stride, expansion)]
            blocks += [_MNASInverted(cout, cout, ks, 1, expansion) for _ in range(n - 1)]
            return Sequential(*blocks)

        d = [c(32), c(16), c(24), c(40), c(80), c(96), c(192), c(320)]
        self.layers = Sequential(
            Conv2d(3, d[0], 3, padding=1, stride=2, bias=False),
            BatchNorm2d(d[0]), ReLU(),
            Conv2d(d[0], d[0], 3, padding=1, groups=d[0], bias=False),
            BatchNorm2d(d[0]), ReLU(),
            Conv2d(d[0], d[1], 1, bias=False), BatchNorm2d(d[1]),
            stack(d[1], d[2], 3, 2, 3, 3),
            stack(d[2], d[3], 5, 2, 3, 3),
            stack(d[3], d[4], 5, 2, 6, 3),
            stack(d[4], d[5], 3, 1, 6, 2),
            stack(d[5], d[6], 5, 2, 6, 4),
            stack(d[6], d[7], 3, 1, 6, 1),
            Conv2d(d[7], 1280, 1, bias=False), BatchNorm2d(1280), ReLU())
        self.classifier = Sequential(Dropout(0.2), Linear(1280, num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.layers(P, x, prefix + 'layers.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


class _ShuffleUnit(FModule):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.stride = stride
        branch = cout // 2
        if stride > 1:
            self.branch1 = Sequential(
                Conv2d(cin, cin, 3, stride=stride, padding=1, groups=cin, bias=False),
                BatchNorm2d(cin),
                Conv2d(cin, branch, 1, bias=False), BatchNorm2d(branch), ReLU())
        cin2 = cin if stride > 1 else branch
        self.branch2 = Sequential(
            Conv2d(cin2, branch, 1, bias=False), BatchNorm2d(branch), ReLU(),
            Conv2d(branch, branch, 3, stride=stride, padding=1, groups=branch, bias=False),
            BatchNorm2d(branch),
            Conv2d(branch, branch, 1, bias=False), BatchNorm2d(branch), ReLU())

    def __call__(self, P, x, prefix='', training=False):
        if self.stride == 1:
            half = x.shape[1] // 2
            x1, x2 = x[:, :half], x[:, half:]
            out = jnp.concatenate(
                [x1, self.branch2(P, x2, prefix + 'branch2.', training)], axis=1)
        else:
            out = jnp.concatenate(
                [self.branch1(P, x, prefix + 'branch1.', training),
                 self.branch2(P, x, prefix + 'branch2.', training)], axis=1)
        b, ch, h, w = out.shape
        out = out.reshape(b, 2, ch // 2, h, w).transpose(0, 2, 1, 3, 4)
        return out.reshape(b, ch, h, w)


class ShuffleNetV2F(_Target):
    def __init__(self, num_classes=1000, w=1.0, variant='x1_0'):
        super().__init__()
        from .torch_zoo import SHUFFLE_STAGES
        c = lambda v: max(4, int(v * w) // 2 * 2)
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        stages_out = [c(v) for v in SHUFFLE_STAGES[variant]]
        self.conv1 = Sequential(Conv2d(3, stages_out[0], 3, stride=2, padding=1, bias=False),
                                BatchNorm2d(stages_out[0]), ReLU())
        self.maxpool = MaxPool2d(3, stride=2, padding=1)
        cin = stages_out[0]
        for i, (cout, repeats) in enumerate(zip(stages_out[1:4], (4, 8, 4))):
            seq = [_ShuffleUnit(cin, cout, 2)]
            seq += [_ShuffleUnit(cout, cout, 1) for _ in range(repeats - 1)]
            setattr(self, f'stage{i + 2}', Sequential(*seq))
            cin = cout
        self.conv5 = Sequential(Conv2d(cin, stages_out[4], 1, bias=False),
                                BatchNorm2d(stages_out[4]), ReLU())
        self.fc = Linear(stages_out[4], num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.maxpool(P, self.conv1(P, x, prefix + 'conv1.', training))
        for i in (2, 3, 4):
            x = getattr(self, f'stage{i}')(P, x, f'{prefix}stage{i}.', training)
        x = self.conv5(P, x, prefix + 'conv5.', training)
        return self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)


class _RegBlock(FModule):
    def __init__(self, cin, cout, stride, group_width, se_ratio=0.25, use_se=True):
        super().__init__()
        self.use_se = use_se
        self.proj = None
        if cin != cout or stride != 1:
            self.proj = Sequential(Conv2d(cin, cout, 1, stride=stride, bias=False),
                                   BatchNorm2d(cout))
            self.add('proj', self.proj)
        f = FModule()
        groups = max(1, cout // group_width)
        f.add('a', Sequential(Conv2d(cin, cout, 1, bias=False), BatchNorm2d(cout), ReLU()))
        f.add('b', Sequential(Conv2d(cout, cout, 3, stride=stride, padding=1,
                                     groups=groups, bias=False),
                              BatchNorm2d(cout), ReLU()))
        if use_se:
            f.add('se', _SEBlock(cout, max(1, int(cin * se_ratio)), act='relu', pooled=True))
        f.add('c', Sequential(Conv2d(cout, cout, 1, bias=False), BatchNorm2d(cout)))
        self.add('f', f)
        self.f = f

    def __call__(self, P, x, prefix='', training=False):
        idt = x if self.proj is None else self.proj(P, x, prefix + 'proj.', training)
        y = self.f._children['a'](P, x, prefix + 'f.a.', training)
        y = self.f._children['b'](P, y, prefix + 'f.b.', training)
        if self.use_se:
            y = self.f._children['se'](P, y, prefix + 'f.se.', training)
        y = self.f._children['c'](P, y, prefix + 'f.c.', training)
        return jax.nn.relu(idt + y)


class RegNetF(_Target):
    def __init__(self, num_classes=1000, w=1.0, variant='regnet_y_400mf'):
        super().__init__()
        from .configs import regnet_config
        widths, depths, gws, use_se = regnet_config(variant, w)
        c = lambda v: max(8, int(v * w) // 8 * 8)
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        self.stem = Sequential(Conv2d(3, c(32), 3, stride=2, padding=1, bias=False),
                               BatchNorm2d(c(32)), ReLU())
        stages = []
        cin = c(32)
        for wd, dep, gw in zip(widths, depths, gws):
            blocks = [_RegBlock(cin if j == 0 else wd, wd, 2 if j == 0 else 1, gw,
                                use_se=use_se)
                      for j in range(dep)]
            stages.append(Sequential(*blocks))
            cin = wd
        self.trunk_output = Sequential(*stages)
        self.fc = Linear(cin, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.trunk_output(P, self.stem(P, x, prefix + 'stem.', training),
                              prefix + 'trunk_output.', training)
        return self.fc(P, x.mean(axis=(2, 3)), prefix + 'fc.', training)


class _FusedMBConv(FModule):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        mid = cin * expand
        self.use_res = stride == 1 and cin == cout
        if expand != 1:
            mods = [Conv2d(cin, mid, 3, stride=stride, padding=1, bias=False),
                    BatchNorm2d(mid), SiLU(),
                    Conv2d(mid, cout, 1, bias=False), BatchNorm2d(cout)]
        else:
            mods = [Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                    BatchNorm2d(cout), SiLU()]
        self.block = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class _MBConvV2(FModule):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        mid = cin * expand
        self.use_res = stride == 1 and cin == cout
        self.block = Sequential(
            Conv2d(cin, mid, 1, bias=False), BatchNorm2d(mid), SiLU(),
            Conv2d(mid, mid, 3, stride=stride, padding=1, groups=mid, bias=False),
            BatchNorm2d(mid), SiLU(),
            _SEBlock(mid, max(1, cin // 4)),
            Conv2d(mid, cout, 1, bias=False), BatchNorm2d(cout))

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class EffNetV2F(_Target):
    def __init__(self, num_classes=1000, w=1.0):
        super().__init__()
        c = lambda v: max(4, int(v * w) // 4 * 4)
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        cfgs = [(_FusedMBConv, c(24), 1, 1, 2), (_FusedMBConv, c(48), 2, 4, 2),
                (_FusedMBConv, c(64), 2, 4, 2), (_MBConvV2, c(128), 2, 4, 2),
                (_MBConvV2, c(160), 1, 6, 2), (_MBConvV2, c(256), 2, 6, 2)]
        stages = [Sequential(Conv2d(3, c(24), 3, stride=2, padding=1, bias=False),
                             BatchNorm2d(c(24)), SiLU())]
        cin = c(24)
        for blk, cout, stride, expand, rep in cfgs:
            blocks = [blk(cin if j == 0 else cout, cout, stride if j == 0 else 1, expand)
                      for j in range(rep)]
            stages.append(Sequential(*blocks))
            cin = cout
        stages.append(Sequential(Conv2d(cin, c(1280), 1, bias=False),
                                 BatchNorm2d(c(1280)), SiLU()))
        self.features = Sequential(*stages)
        self.classifier = Sequential(Dropout(0.2), Linear(c(1280), num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


class _FusedMBConvSD(FModule):
    """Exact torchvision FusedMBConv (has a parameter-free 'sd' child)."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        mid = cin * expand
        self.use_res = stride == 1 and cin == cout
        if expand != 1:
            mods = [Conv2d(cin, mid, 3, stride=stride, padding=1, bias=False),
                    BatchNorm2d(mid), SiLU(),
                    Conv2d(mid, cout, 1, bias=False), BatchNorm2d(cout)]
        else:
            mods = [Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
                    BatchNorm2d(cout), SiLU()]
        self.block = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class EffNetV2ExactF(_Target):
    """Twin of torch_zoo.efficientnet_v2 (S/M/L stage tables)."""

    def __init__(self, num_classes=1000, w=1.0, variant='efficientnet_v2_s'):
        super().__init__()
        from .configs import EFFNET_V2_CFGS
        cfg = EFFNET_V2_CFGS[variant]
        rows, head = cfg['rows'], cfg['head']
        c = lambda v: max(4, int(v * w) // 4 * 4)
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}
        stem = c(rows[0][4])
        feats = [Conv2d(3, stem, 3, stride=2, padding=1, bias=False),
                 BatchNorm2d(stem), SiLU()]
        for kind, t, k, s, cin, cout, n in rows:
            blk = _FusedMBConvSD if kind == 'fused' else _MBConvV2
            for i in range(n):
                feats.append(blk(c(cin) if i == 0 else c(cout), c(cout),
                                 s if i == 0 else 1, t))
        feats += [Conv2d(c(rows[-1][5]), c(head), 1, bias=False),
                  BatchNorm2d(c(head)), SiLU()]
        self.features = Sequential(*feats)
        self.classifier = Sequential(Dropout(0.2), Linear(c(head), num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


def _swin_rel_index(window: int):
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype('int32')


def _swin_attn_mask(h: int, w: int, window: int, shift: int):
    import numpy as np
    mask = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in ((0, h - window), (h - window, h - shift), (h - shift, h)):
        for vs in ((0, w - window), (w - window, w - shift), (w - shift, w)):
            mask[hs[0]:hs[1], vs[0]:vs[1]] = cnt
            cnt += 1
    nwh, nww = h // window, w // window
    mw = mask.reshape(nwh, window, nww, window).transpose(0, 2, 1, 3) \
             .reshape(nwh * nww, window * window)
    am = mw[:, None, :] - mw[:, :, None]
    return np.where(am != 0, -100.0, 0.0).astype(np.float32)


class _SwinAttnF(FModule):
    def __init__(self, dim, heads, shift, window):
        super().__init__()
        self.dim, self.heads, self.shift, self.window = dim, heads, shift, window
        self.qkv = Linear(dim, dim * 3)
        self.proj = Linear(dim, dim)
        self.declare('relative_position_bias_table',
                     ((2 * window - 1) ** 2, heads), True)
        self.rel_index = _swin_rel_index(window)

    def __call__(self, P, x, prefix='', training=False):
        b, h, w, c = x.shape
        ws, sh, nh = self.window, self.shift, self.heads
        if sh > 0:
            x = jnp.roll(x, shift=(-sh, -sh), axis=(1, 2))
        nwh, nww = h // ws, w // ws
        xw = x.reshape(b, nwh, ws, nww, ws, c).transpose(0, 1, 3, 2, 4, 5) \
              .reshape(b * nwh * nww, ws * ws, c)
        qkv = self.qkv(P, xw, prefix + 'qkv.', training) \
            .reshape(xw.shape[0], ws * ws, 3, nh, c // nh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * (c // nh) ** -0.5
        # bias table is a bare parameter the GHN does not predict; zeros = init
        table = self.p(P, prefix, 'relative_position_bias_table')
        if table is None:
            table = jnp.zeros(((2 * ws - 1) ** 2, nh), x.dtype)
        bias = table[self.rel_index.reshape(-1)].reshape(ws * ws, ws * ws, nh)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if sh > 0:
            am = jnp.asarray(_swin_attn_mask(h, w, ws, sh))
            attn = attn.reshape(b, nwh * nww, nh, ws * ws, ws * ws)
            attn = attn + am[None, :, None]
            attn = attn.reshape(-1, nh, ws * ws, ws * ws)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', attn, v).transpose(0, 2, 1, 3) \
            .reshape(xw.shape[0], ws * ws, c)
        y = self.proj(P, y, prefix + 'proj.', training)
        y = y.reshape(b, nwh, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5) \
             .reshape(b, h, w, c)
        if sh > 0:
            y = jnp.roll(y, shift=(sh, sh), axis=(1, 2))
        return y


class _SwinBlockF(FModule):
    def __init__(self, dim, heads, shift, window, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = LayerNorm(dim)
        self.attn = _SwinAttnF(dim, heads, shift, window)
        self.norm2 = LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = Sequential(Linear(dim, hidden), GELU(), Dropout(0.0),
                              Linear(hidden, dim), Dropout(0.0))

    def __call__(self, P, x, prefix='', training=False):
        # stochastic depth is identity at inference (eval twins)
        x = x + self.attn(P, self.norm1(P, x, prefix + 'norm1.', training),
                          prefix + 'attn.', training)
        return x + self.mlp(P, self.norm2(P, x, prefix + 'norm2.', training),
                            prefix + 'mlp.', training)


class _PatchMergingF(FModule):
    def __init__(self, dim):
        super().__init__()
        self.reduction = Linear(4 * dim, 2 * dim, bias=False)
        self.norm = LayerNorm(4 * dim)

    def __call__(self, P, x, prefix='', training=False):
        x = jnp.concatenate([x[..., 0::2, 0::2, :], x[..., 1::2, 0::2, :],
                             x[..., 0::2, 1::2, :], x[..., 1::2, 1::2, :]], axis=-1)
        x = self.norm(P, x, prefix + 'norm.', training)
        return self.reduction(P, x, prefix + 'reduction.', training)


class _PatchEmbedF(FModule):
    """Conv stem + NHWC permute + LN; named 0/2 to mirror the torch Sequential
    (the Permute module at index 1 has no parameters)."""

    def __init__(self, dim):
        super().__init__()
        self.add('0', Conv2d(3, dim, 4, stride=4))
        self.add('2', LayerNorm(dim))

    def __call__(self, P, x, prefix='', training=False):
        x = self._children['0'](P, x, prefix + '0.', training).transpose(0, 2, 3, 1)
        return self._children['2'](P, x, prefix + '2.', training)


class SwinF(_Target):
    def __init__(self, num_classes=1000, embed_dim=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=7, mlp_ratio=4.0,
                 stochastic_depth_prob=0.2, input_sz=224):
        super().__init__()
        self.num_classes = num_classes
        self.expected_input_sz = input_sz
        self.predicted: Dict[str, jnp.ndarray] = {}
        layers = [_PatchEmbedF(embed_dim)]
        dim = embed_dim
        for si, (dep, nh) in enumerate(zip(depths, heads)):
            blocks = [_SwinBlockF(dim, nh, 0 if i % 2 == 0 else window // 2,
                                  window, mlp_ratio) for i in range(dep)]
            layers.append(Sequential(*blocks))
            if si < len(depths) - 1:
                layers.append(_PatchMergingF(dim))
                dim *= 2
        self.features = Sequential(*layers)
        self.norm = LayerNorm(dim)
        self.head = Linear(dim, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training)
        x = self.norm(P, x, prefix + 'norm.', training)
        return self.head(P, x.mean(axis=(1, 2)), prefix + 'head.', training)


class _SEHardF(FModule):
    """MobileNetV3 squeeze-excite: relu + hard-sigmoid gating."""

    def __init__(self, cin):
        super().__init__()
        from .configs import make_divisible
        sq = make_divisible(cin // 4, 8)
        self.fc1 = Conv2d(cin, sq, 1)
        self.fc2 = Conv2d(sq, cin, 1)

    def __call__(self, P, x, prefix='', training=False):
        s = x.mean(axis=(2, 3), keepdims=True)
        s = jax.nn.relu(self.fc1(P, s, prefix + 'fc1.', training))
        s = jax.nn.hard_sigmoid(self.fc2(P, s, prefix + 'fc2.', training))
        return x * s


class _MNV3Block(FModule):
    def __init__(self, cin, exp, cout, k, stride, se, hs):
        super().__init__()
        act = Hardswish if hs else ReLU
        self.use_res = stride == 1 and cin == cout
        mods = []
        if exp != cin:
            mods += [Conv2d(cin, exp, 1, bias=False), BatchNorm2d(exp), act()]
        mods += [Conv2d(exp, exp, k, stride=stride, padding=k // 2, groups=exp,
                        bias=False),
                 BatchNorm2d(exp), act()]
        if se:
            mods.append(_SEHardF(exp))
        mods += [Conv2d(exp, cout, 1, bias=False), BatchNorm2d(cout)]
        self.block = Sequential(*mods)

    def __call__(self, P, x, prefix='', training=False):
        y = self.block(P, x, prefix + 'block.', training)
        return x + y if self.use_res else y


class MobileNetV3F(_Target):
    def __init__(self, num_classes=1000, w=1.0, variant='small'):
        super().__init__()
        from ghn3_tpu.zoo.torch_zoo import MNV3_CFGS
        self.num_classes = num_classes
        self.expected_input_sz = 224
        self.predicted: Dict[str, jnp.ndarray] = {}

        def c8(v):
            v = int(v * w)
            return max(8, (v + 4) // 8 * 8)

        cfg, last_c, hidden_c = MNV3_CFGS[variant]
        feats = [Sequential(Conv2d(3, c8(16), 3, stride=2, padding=1, bias=False),
                            BatchNorm2d(c8(16)), Hardswish())]
        for cin, exp, cout, k, s_, se, hs in cfg:
            feats.append(_MNV3Block(c8(cin), c8(exp), c8(cout), k, s_, se, hs))
        last = c8(last_c)
        feats.append(Sequential(Conv2d(c8(cfg[-1][2]), last, 1, bias=False),
                                BatchNorm2d(last), Hardswish()))
        self.features = Sequential(*feats)
        self.classifier = Sequential(Linear(last, c8(hidden_c)), Hardswish(),
                                     Dropout(0.2), Linear(c8(hidden_c), num_classes))

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training).mean(axis=(2, 3))
        return self.classifier(P, x, prefix + 'classifier.', training)


JAX_ZOO = {
    'resnet18': lambda num_classes=1000: ResNetF('basic', (2, 2, 2, 2), num_classes=num_classes),
    'resnet34': lambda num_classes=1000: ResNetF('basic', (3, 4, 6, 3), num_classes=num_classes),
    'resnet50': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 6, 3), num_classes=num_classes),
    'resnet101': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 23, 3), num_classes=num_classes),
    'resnet152': lambda num_classes=1000: ResNetF('bottleneck', (3, 8, 36, 3), num_classes=num_classes),
    'wide_resnet50_2': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 6, 3), width=128,
                                                        num_classes=num_classes),
    'vit_b_16': lambda num_classes=1000: ViTF(num_classes=num_classes),
    'alexnet': alexnet_f,
    'vgg11': vgg11_f,
    'vgg16_bn': vgg16_bn_f,
    'mobilenet_v2': MobileNetV2F,
    'squeezenet1_1': SqueezeNetF,
    'densenet121': DenseNetF,
    'efficientnet_b0ish': EffNetB0F,
    'convnext_tiny_ish': ConvNeXtF,
    'inception_v3ish': InceptionV3F,
    'googlenet': GoogLeNetF,
    'mnasnet1_0': MNASNetF,
    'shufflenet_v2_x1_0': ShuffleNetV2F,
    'regnet_y_400mf': RegNetF,
    'efficientnet_v2_s_ish': EffNetV2F,
    'swin_t': SwinF,
    'wide_resnet101_2': lambda num_classes=1000: ResNetF(
        'bottleneck', (3, 4, 23, 3), width=128, num_classes=num_classes),
    'resnext50_32x4d': lambda num_classes=1000: ResNetF(
        'bottleneck', (3, 4, 6, 3), width=4, groups=32, num_classes=num_classes),
    'resnext101_32x8d': lambda num_classes=1000: ResNetF(
        'bottleneck', (3, 4, 23, 3), width=8, groups=32, num_classes=num_classes),
    'vgg13_bn': lambda num_classes=1000: vgg16_bn_f(num_classes, depth=13),
    'vgg19_bn': lambda num_classes=1000: vgg16_bn_f(num_classes, depth=19),
    'vgg13': lambda num_classes=1000, w=1.0: vgg11_f(num_classes, w=w, depth=13),
    'vgg19': lambda num_classes=1000, w=1.0: vgg11_f(num_classes, w=w, depth=19),
    'densenet169': lambda num_classes=1000, growth=32: DenseNetF(
        num_classes, growth, block_config=(6, 12, 32, 32)),
    'densenet201': lambda num_classes=1000, growth=32: DenseNetF(
        num_classes, growth, block_config=(6, 12, 48, 32)),
    'shufflenet_v2_x0_5': lambda num_classes=1000, w=1.0: ShuffleNetV2F(
        num_classes, w=w, variant='x0_5'),
    'shufflenet_v2_x2_0': lambda num_classes=1000, w=1.0: ShuffleNetV2F(
        num_classes, w=w, variant='x2_0'),
    'mnasnet0_5': lambda num_classes=1000: MNASNetF(num_classes, w=0.5),
    'mnasnet1_3': lambda num_classes=1000: MNASNetF(num_classes, w=1.3),
    'vit_b_32': lambda num_classes=1000: ViTF(num_classes=num_classes, patch=32),
    'vit_l_16': lambda num_classes=1000: ViTF(num_classes=num_classes, dim=1024,
                                              depth=24, heads=16),
    'mobilenet_v3_small': MobileNetV3F,
    'mobilenet_v2_x1_4': lambda num_classes=1000: MobileNetV2F(
        num_classes, width_mult=1.4),
}

from .configs import REGNET_PARAMS as _REGNET_PARAMS  # noqa: E402
from .configs import EFFICIENTNET_V1_MULTS as _EFF_V1  # noqa: E402
from .configs import EFFNET_V2_CFGS as _EFF_V2  # noqa: E402
from .configs import CONVNEXT_CFGS as _CONVNEXT  # noqa: E402
from .configs import SWIN_CFGS as _SWIN  # noqa: E402

for _v in _REGNET_PARAMS:
    if _v not in JAX_ZOO:
        JAX_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                       RegNetF(num_classes, w, variant=_v))
for _v in _EFF_V1:
    JAX_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                   EffNetV1F(num_classes, w, variant=_v))
for _v in _EFF_V2:
    JAX_ZOO[_v] = (lambda num_classes=1000, w=1.0, _v=_v:
                   EffNetV2ExactF(num_classes, w, variant=_v))
for _v in _CONVNEXT:
    JAX_ZOO[_v] = (lambda num_classes=1000, _v=_v:
                   ConvNeXtF(num_classes, dims=_CONVNEXT[_v][1],
                             depths=_CONVNEXT[_v][0]))
for _v in ('swin_s', 'swin_b'):
    JAX_ZOO[_v] = (lambda num_classes=1000, _v=_v:
                   SwinF(num_classes, embed_dim=_SWIN[_v][0],
                         depths=_SWIN[_v][1], heads=_SWIN[_v][2]))
del _v

JAX_ZOO.update({
    'densenet161': lambda num_classes=1000: DenseNetF(
        num_classes, growth=48, block_config=(6, 12, 36, 24), init_features=96),
    'mobilenet_v3_large': lambda num_classes=1000, w=1.0: MobileNetV3F(
        num_classes, w=w, variant='large'),
    'squeezenet1_0': lambda num_classes=1000: SqueezeNetF(
        num_classes, version='1_0'),
    'mnasnet0_75': lambda num_classes=1000: MNASNetF(num_classes, w=0.75),
    'resnext101_64x4d': lambda num_classes=1000: ResNetF(
        'bottleneck', (3, 4, 23, 3), width=4, groups=64, num_classes=num_classes),
    'shufflenet_v2_x1_5': lambda num_classes=1000, w=1.0: ShuffleNetV2F(
        num_classes, w=w, variant='x1_5'),
    'vgg11_bn': lambda num_classes=1000: vgg16_bn_f(num_classes, depth=11),
    'vgg16': lambda num_classes=1000, w=1.0: vgg11_f(num_classes, w=w, depth=16),
    'vit_l_32': lambda num_classes=1000: ViTF(num_classes=num_classes, dim=1024,
                                              depth=24, heads=16, patch=32),
    'inception_v3': InceptionV3ExactF,
})
