"""Functional target-network layer library (JAX).

Replaces the reference's torch/light module system (/root/reference/ghn3/ops.py,
light_ops.py): a target network is a tree of ``FModule`` nodes that *declare*
parameter shapes (the "lightweight skeleton" concept — shapes without storage)
and *apply* with an explicit param dict. Predicted parameters flow in as a
``dict[name, jnp.ndarray]`` — nothing is mutated, so prediction + target forward
is one differentiable jit program for meta-training.

Layouts follow torch conventions (NCHW activations, OIHW conv weights,
(out, in) linear weights) so decoded tensors drop in unchanged.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FModule:
    """Base functional module: children + declared parameter shapes."""

    def __init__(self):
        self._children: Dict[str, 'FModule'] = {}
        self._declared: Dict[str, Tuple[Tuple[int, ...], bool]] = {}

    # -- construction ------------------------------------------------------
    def add(self, name: str, child: Optional['FModule']) -> Optional['FModule']:
        if child is not None:
            self._children[str(name)] = child
        return child

    def declare(self, name: str, shape: Tuple[int, ...], is_w: bool = True) -> None:
        self._declared[name] = (tuple(int(s) for s in shape), is_w)

    def __setattr__(self, name, value):
        if isinstance(value, FModule):
            self._children[name] = value
        object.__setattr__(self, name, value)

    # -- introspection -----------------------------------------------------
    def named_params(self, prefix: str = '') -> Iterator[Tuple[str, Tuple[int, ...], bool]]:
        for name, (shape, is_w) in self._declared.items():
            yield (prefix + name if prefix else name), shape, is_w
        for cname, child in self._children.items():
            cpre = f'{prefix}{cname}.' if prefix else f'{cname}.'
            yield from child.named_params(cpre)

    def named_modules(self, prefix: str = '') -> Iterator[Tuple[str, 'FModule']]:
        yield prefix.rstrip('.'), self
        for cname, child in self._children.items():
            cpre = f'{prefix}{cname}.' if prefix else f'{cname}.'
            yield from child.named_modules(cpre)

    # -- execution ---------------------------------------------------------
    def __call__(self, P: Dict[str, jnp.ndarray], x, prefix: str = '', training: bool = False):
        raise NotImplementedError

    def p(self, P, prefix: str, name: str):
        return P.get(prefix + name if prefix else name)


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (int(v), int(v))


class Identity(FModule):
    def __call__(self, P, x, prefix='', training=False):
        return x


class Zero(FModule):
    def __init__(self, stride=1):
        super().__init__()
        self.stride = stride

    def __call__(self, P, x, prefix='', training=False):
        if self.stride > 1:
            x = x[:, :, ::self.stride, ::self.stride]
        return x * 0.0


class Stride(FModule):
    def __init__(self, stride):
        super().__init__()
        self.stride = stride

    def __call__(self, P, x, prefix='', training=False):
        if self.stride == 1:
            return x
        return x[:, :, ::self.stride, ::self.stride]


class ReLU(FModule):
    def __init__(self, inplace=False):
        super().__init__()

    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.relu(x)


class GELU(FModule):
    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.gelu(x, approximate=False)


class Hardswish(FModule):
    def __init__(self, inplace=False):
        super().__init__()

    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.hard_swish(x)


class Hardsigmoid(FModule):
    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.hard_sigmoid(x)


class SiLU(FModule):
    def __init__(self, inplace=False):
        super().__init__()

    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.silu(x)


class ReLU6(FModule):
    def __init__(self, inplace=False):
        super().__init__()

    def __call__(self, P, x, prefix='', training=False):
        return jnp.clip(x, 0.0, 6.0)


class Sigmoid(FModule):
    def __call__(self, P, x, prefix='', training=False):
        return jax.nn.sigmoid(x)


class Flatten(FModule):
    def __call__(self, P, x, prefix='', training=False):
        return x.reshape(x.shape[0], -1)


class Dropout(FModule):
    """Deterministic inference dropout (identity); stochastic mode is handled by
    the trainer passing explicit rng when needed."""

    def __init__(self, p=0.5, inplace=False):
        super().__init__()
        self.rate = p

    def __call__(self, P, x, prefix='', training=False):
        return x


class Conv2d(FModule):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = padding if isinstance(padding, str) else _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.declare('weight', (out_channels, in_channels // groups, *self.kernel_size), True)
        if bias:
            self.declare('bias', (out_channels,), False)

    def __call__(self, P, x, prefix='', training=False):
        w = self.p(P, prefix, 'weight')
        if isinstance(self.padding, str):
            pad = self.padding.upper()
        else:
            pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self.stride, padding=pad,
            rhs_dilation=self.dilation, feature_group_count=self.groups,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        b = self.p(P, prefix, 'bias')
        if b is not None:
            y = y + b[None, :, None, None]
        return y


class Linear(FModule):
    def __init__(self, in_features, out_features, bias=True):
        super().__init__()
        self.declare('weight', (out_features, in_features), True)
        if bias:
            self.declare('bias', (out_features,), False)

    def __call__(self, P, x, prefix='', training=False):
        y = x @ self.p(P, prefix, 'weight').T
        b = self.p(P, prefix, 'bias')
        return y if b is None else y + b


class BatchNorm2d(FModule):
    """Batch-statistics normalization (track_running_stats=False semantics —
    the mode the GHN pipeline uses for both training and running-stat-free eval,
    reference light_ops.py:264-312, eval_ghn.py:155-160)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 track_running_stats=False):
        super().__init__()
        assert affine
        self.eps = eps
        self.declare('weight', (num_features,), True)
        self.declare('bias', (num_features,), False)

    def __call__(self, P, x, prefix='', training=False):
        mu = x.mean(axis=(0, 2, 3), keepdims=True)
        var = ((x - mu) ** 2).mean(axis=(0, 2, 3), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return y * self.p(P, prefix, 'weight')[None, :, None, None] \
            + self.p(P, prefix, 'bias')[None, :, None, None]


class LayerNorm(FModule):
    def __init__(self, normalized_shape, eps=1e-5):
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.shape = tuple(normalized_shape)
        self.eps = eps
        self.declare('weight', self.shape, True)
        self.declare('bias', self.shape, False)

    def __call__(self, P, x, prefix='', training=False):
        axes = tuple(range(x.ndim - len(self.shape), x.ndim))
        mu = x.mean(axis=axes, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=axes, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return y * self.p(P, prefix, 'weight') + self.p(P, prefix, 'bias')


def _pool(x, kind, kernel, stride, padding, count_include_pad=True,
          ceil_mode=False):
    k = _pair(kernel)
    s = _pair(stride if stride is not None else kernel)
    p = _pair(padding)
    dims = (1, 1, k[0], k[1])
    strides = (1, 1, s[0], s[1])
    pads = [(0, 0), (0, 0), [p[0], p[0]], [p[1], p[1]]]
    if ceil_mode:
        # torch ceil_mode: extend the right/bottom padding so the last window
        # starts inside the (left-padded) input
        for d, (hk, hs, hp) in enumerate(zip(k, s, p)):
            size = x.shape[2 + d]
            out_ceil = -(-(size + 2 * hp - hk) // hs) + 1
            # last window must start within input+left padding (torch rule)
            if (out_ceil - 1) * hs >= size + hp:
                out_ceil -= 1
            needed = (out_ceil - 1) * hs + hk - size - hp
            pads[2 + d][1] = max(hp, needed)
    pads = tuple(tuple(v) for v in pads)
    if kind == 'max':
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, pads)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    if count_include_pad:
        return summed / (k[0] * k[1])
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts


class MaxPool2d(FModule):
    def __init__(self, kernel_size, stride=None, padding=0, ceil_mode=False):
        super().__init__()
        self.k, self.s, self.pad = kernel_size, stride, padding
        self.ceil_mode = ceil_mode

    def __call__(self, P, x, prefix='', training=False):
        return _pool(x, 'max', self.k, self.s, self.pad, ceil_mode=self.ceil_mode)


def adaptive_avg_pool2d(x, output_size):
    """torch.nn.functional.adaptive_avg_pool2d semantics: per-cell windows
    [floor(i*H/h), ceil((i+1)*H/h)). Uniform reduce_window when divisible;
    static unrolled slices otherwise (output sizes are tiny: <= 7x7)."""
    oh, ow = _pair(output_size)
    b, c, h, w = x.shape
    if oh == 1 and ow == 1:
        return x.mean(axis=(2, 3), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        y = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, kh, kw),
                                  (1, 1, kh, kw), 'VALID')
        return y / (kh * kw)
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, :, h0:h1, w0:w1].mean(axis=(2, 3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


class AvgPool2d(FModule):
    def __init__(self, kernel_size, stride=None, padding=0, count_include_pad=True):
        super().__init__()
        self.k, self.s, self.pad = kernel_size, stride, padding
        self.cip = count_include_pad

    def __call__(self, P, x, prefix='', training=False):
        return _pool(x, 'avg', self.k, self.s, self.pad, self.cip)


class AdaptiveAvgPool2d(FModule):
    def __init__(self, output_size=1):
        super().__init__()
        self.output_size = output_size

    def __call__(self, P, x, prefix='', training=False):
        return adaptive_avg_pool2d(x, self.output_size)


class Sequential(FModule):
    def __init__(self, *mods):
        super().__init__()
        self.mods: List[FModule] = []
        for m in mods:
            self.append(m)

    def append(self, m: FModule):
        self.add(str(len(self.mods)), m)
        self.mods.append(m)
        return self

    def __getitem__(self, i):
        return self.mods[i]

    def __len__(self):
        return len(self.mods)

    def __call__(self, P, x, prefix='', training=False):
        for i, m in enumerate(self.mods):
            x = m(P, x, prefix=f'{prefix}{i}.', training=training)
        return x


class ModuleList(FModule):
    def __init__(self, mods=()):
        super().__init__()
        self.mods: List[FModule] = []
        for m in mods:
            self.append(m)

    def append(self, m: FModule):
        self.add(str(len(self.mods)), m)
        self.mods.append(m)
        return self

    def __getitem__(self, i):
        return self.mods[i]

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)
