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

from ..nets.functional import (BatchNorm2d, Conv2d, FModule,
                               LayerNorm, Linear, MaxPool2d, Sequential)


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

    def __init__(self, cin, planes, stride=1, downsample=False, base_width=64):
        super().__init__()
        w = int(planes * (base_width / 64.0))
        self.conv1 = Conv2d(cin, w, 1, bias=False)
        self.bn1 = BatchNorm2d(w)
        self.conv2 = Conv2d(w, w, 3, stride=stride, padding=1, bias=False)
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
    def __init__(self, block: str, layers: Tuple[int, ...], width=64, num_classes=1000):
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
                kw = {'base_width': width} if blk is _Bottleneck else {}
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


class _ViTBlock(FModule):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.ln1 = LayerNorm(dim)
        self.ln2 = LayerNorm(dim)
        self.to_qkv = Linear(dim, dim * 3, bias=False)
        self.to_out = Linear(dim, dim)
        self.fc1 = Linear(dim, dim * 4)
        self.fc2 = Linear(dim * 4, dim)
        # match torch_zoo naming: attn.{to_qkv,to_out}
        self._children.pop('to_qkv')
        self._children.pop('to_out')
        attn = FModule()
        attn.add('to_qkv', self.to_qkv)
        attn.add('to_out', self.to_out)
        self.add('attn', attn)

    def __call__(self, P, x, prefix='', training=False):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        y = self.ln1(P, x, prefix + 'ln1.', training)
        qkv = self.to_qkv(P, y, prefix + 'attn.to_qkv.', training)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm', q, k) * (d ** -0.5), axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', att, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + self.to_out(P, y, prefix + 'attn.to_out.', training)
        y = self.ln2(P, x, prefix + 'ln2.', training)
        y = self.fc1(P, y, prefix + 'fc1.', training)
        y = self.fc2(P, jax.nn.gelu(y, approximate=False), prefix + 'fc2.', training)
        return x + y


class ViTF(FModule):
    """Functional twin of zoo/torch_zoo.vit_b_16 (learned pos-embedding ViT)."""

    def __init__(self, num_classes=1000, dim=768, depth=12, heads=12, patch=16,
                 img_size=224):
        super().__init__()
        self._n_cells = 1
        self.expected_input_sz = img_size
        self.num_classes = num_classes
        n_tok = (img_size // patch) ** 2
        self.patch = patch
        self.stem0 = Conv2d(3, dim, patch, stride=patch, bias=False)
        pos = FModule()
        pos.declare('weight', (n_tok, dim), True)
        self.add('pos_enc', pos)
        self.pos_enc = pos
        blocks = Sequential()
        for _ in range(depth):
            blocks.append(_ViTBlock(dim, heads))
        self.blocks = blocks
        self.ln = LayerNorm(dim)
        self.head = Linear(dim, num_classes)
        self.predicted: Dict[str, jnp.ndarray] = {}

    def __call__(self, P, x, prefix='', training=False):
        x = self.stem0(P, x, prefix + 'stem0.', training)
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        x = x + self.pos_enc.p(P, prefix + 'pos_enc.', 'weight')[None]
        x = self.blocks(P, x, prefix + 'blocks.', training)
        x = self.ln(P, x, prefix + 'ln.', training)
        return self.head(P, x.mean(axis=1), prefix + 'head.', training)

    param_shapes = ResNetF.param_shapes
    param_table = ResNetF.param_table


JAX_ZOO = {
    'resnet18': lambda num_classes=1000: ResNetF('basic', (2, 2, 2, 2), num_classes=num_classes),
    'resnet34': lambda num_classes=1000: ResNetF('basic', (3, 4, 6, 3), num_classes=num_classes),
    'resnet50': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 6, 3), num_classes=num_classes),
    'resnet101': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 23, 3), num_classes=num_classes),
    'resnet152': lambda num_classes=1000: ResNetF('bottleneck', (3, 8, 36, 3), num_classes=num_classes),
    'wide_resnet50_2': lambda num_classes=1000: ResNetF('bottleneck', (3, 4, 6, 3), width=128,
                                                        num_classes=num_classes),
    'vit_b_16': lambda num_classes=1000: ViTF(num_classes=num_classes),
}
