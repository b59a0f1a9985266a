"""DeepNets-1M target-network family: DARTS-style cell networks, functional JAX.

The structural layout (op set, cell wiring, stems, naming like 'cells.0._ops.1.op.1')
is the data format of the DeepNets-1M dataset — graphs stored in the hdf5 files
reference these names — so the module tree mirrors the reference Network factory
(/root/reference/ghn3/ops.py:24-576) while execution is pure-functional JAX on a
param dict (the "lightweight modules" concept reduces to declared shapes).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..graph.genotypes import Genotype, parse_op_ks
from .functional import (AdaptiveAvgPool2d, AvgPool2d, BatchNorm2d, Conv2d, Dropout,
                         FModule, GELU, Identity, LayerNorm, Linear,
                         MaxPool2d, ModuleList, ReLU, Sequential, Stride, Zero)


def bn_layer(norm: Optional[str], c: int) -> FModule:
    if norm in (None, '', 'none'):
        return Identity()
    if norm.startswith('bn'):
        return BatchNorm2d(c, track_running_stats=norm.find('track') >= 0)
    raise NotImplementedError(norm)


class FactorizedReduce(FModule):
    def __init__(self, c_in, c_out, norm='bn', stride=2):
        super().__init__()
        assert c_out % 2 == 0
        self.stride = stride
        self.conv_1 = Conv2d(c_in, c_out // 2, 1, stride=stride, padding=0, bias=False)
        self.conv_2 = Conv2d(c_in, c_out // 2, 1, stride=stride, padding=0, bias=False)
        self.bn = bn_layer(norm, c_out)

    def __call__(self, P, x, prefix='', training=False):
        x = jax.nn.relu(x)
        x2 = x[:, :, 1:, 1:] if self.stride > 1 else x
        y = jnp.concatenate([self.conv_1(P, x, prefix + 'conv_1.', training),
                             self.conv_2(P, x2, prefix + 'conv_2.', training)], axis=1)
        return self.bn(P, y, prefix + 'bn.', training)


class ReLUConvBN(FModule):
    def __init__(self, c_in, c_out, ks=1, stride=1, padding=0, norm='bn', double=False):
        super().__init__()
        self.stride = stride
        if double:
            convs = [Conv2d(c_in, c_in, (1, ks), stride=(1, stride), padding=(0, padding), bias=False),
                     Conv2d(c_in, c_out, (ks, 1), stride=(stride, 1), padding=(padding, 0), bias=False)]
        else:
            convs = [Conv2d(c_in, c_out, ks, stride=stride, padding=padding, bias=False)]
        self.op = Sequential(ReLU(), *convs, bn_layer(norm, c_out))

    def __call__(self, P, x, prefix='', training=False):
        return self.op(P, x, prefix + 'op.', training)


class DilConv(FModule):
    def __init__(self, c_in, c_out, ks, stride, padding, dilation, norm='bn'):
        super().__init__()
        self.stride = stride
        self.op = Sequential(
            ReLU(),
            Conv2d(c_in, c_in, ks, stride=stride, padding=padding, dilation=dilation,
                   groups=c_in, bias=False),
            Conv2d(c_in, c_out, 1, padding=0, bias=False),
            bn_layer(norm, c_out))

    def __call__(self, P, x, prefix='', training=False):
        return self.op(P, x, prefix + 'op.', training)


class SepConv(FModule):
    def __init__(self, c_in, c_out, ks, stride, padding, norm='bn'):
        super().__init__()
        self.stride = stride
        self.op = Sequential(
            ReLU(),
            Conv2d(c_in, c_in, ks, stride=stride, padding=padding, groups=c_in, bias=False),
            Conv2d(c_in, c_in, 1, padding=0, bias=False),
            bn_layer(norm, c_in),
            ReLU(),
            Conv2d(c_in, c_in, ks, stride=1, padding=padding, groups=c_in, bias=False),
            Conv2d(c_in, c_out, 1, padding=0, bias=False),
            bn_layer(norm, c_out))

    def __call__(self, P, x, prefix='', training=False):
        return self.op(P, x, prefix + 'op.', training)


class ChannelSELayer(FModule):
    """Squeeze-excite with Hardswish gating (reference ops.py:235-271)."""

    def __init__(self, num_channels, reduction_ratio=2, dim_out=None, stride=1):
        super().__init__()
        if dim_out is not None:
            assert dim_out == num_channels, (dim_out, num_channels)
        self.stride = stride
        self.fc1 = Linear(num_channels, num_channels // reduction_ratio, bias=True)
        self.fc2 = Linear(num_channels // reduction_ratio, num_channels, bias=True)

    def __call__(self, P, x, prefix='', training=False):
        s = x.mean(axis=(2, 3))
        s = self.fc1(P, s, prefix + 'fc1.', training)
        s = self.fc2(P, jax.nn.relu(s), prefix + 'fc2.', training)
        s = jax.nn.hard_swish(s)
        y = x * s[:, :, None, None]
        if self.stride > 1:
            y = y[:, :, ::self.stride, ::self.stride]
        return y


class PosEnc(FModule):
    def __init__(self, c, ks):
        super().__init__()
        self.declare('weight', (1, c, ks, ks), True)

    def __call__(self, P, x, prefix='', training=False):
        return x + self.p(P, prefix, 'weight')


class TransformerLayer(FModule):
    """Pre-LN transformer block on spatial maps (the target-net 'msa' op;
    same block family as the GHN's graphormer layer with edge_dim=0 —
    reference graphormer.py:144-248 via ops.py OPS['msa'])."""

    def __init__(self, dim, num_heads=8, mlp_ratio=1, stride=1, eps=1e-5):
        super().__init__()
        self.dim = dim
        self.heads = num_heads
        self.stride = stride
        self.ln1 = LayerNorm(dim, eps=eps)
        self.attn = _MSA(dim, num_heads)
        self.ln2 = LayerNorm(dim, eps=eps)
        self.ff = _FF(dim, int(dim * mlp_ratio))

    def __call__(self, P, x, prefix='', training=False):
        sz = x.shape
        if len(sz) == 4:
            x = x.reshape(sz[0], sz[1], -1).transpose(0, 2, 1)   # (B, HW, C)
        y = self.ln1(P, x, prefix + 'ln1.', training)
        x = x + self.attn(P, y, prefix + 'attn.', training)
        y = self.ln2(P, x, prefix + 'ln2.', training)
        x = x + self.ff(P, y, prefix + 'ff.', training)
        if len(sz) == 4:
            x = x.transpose(0, 2, 1).reshape(sz[0], x.shape[2], sz[2], sz[3])
            if self.stride > 1:
                x = x[:, :, ::self.stride, ::self.stride]
        return x


class _MSA(FModule):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_qkv = Linear(dim, dim * 3, bias=False)
        self.to_out = Sequential(Linear(dim, dim))

    def __call__(self, P, x, prefix='', training=False):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        qkv = self.to_qkv(P, x, prefix + 'to_qkv.', training)
        qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * (d ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.to_out(P, y, prefix + 'to_out.', training)


class _FF(FModule):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = Sequential(Linear(dim, hidden), GELU(), Identity(),
                              Linear(hidden, dim), Identity())

    def __call__(self, P, x, prefix='', training=False):
        return self.net(P, x, prefix + 'net.', training)


OPS = {
    'none': lambda i, o, k, s, n: Zero(s),
    'skip_connect': lambda i, o, k, s, n: Identity() if s == 1 else FactorizedReduce(i, o, norm=n),
    'avg_pool': lambda i, o, k, s, n: AvgPool2d(k, stride=s, padding=k // 2, count_include_pad=False),
    'max_pool': lambda i, o, k, s, n: MaxPool2d(k, stride=s, padding=k // 2),
    'conv': lambda i, o, k, s, n: ReLUConvBN(i, o, k, s, k // 2, norm=n),
    'sep_conv': lambda i, o, k, s, n: SepConv(i, o, k, s, k // 2, norm=n),
    'dil_conv': lambda i, o, k, s, n: DilConv(i, o, k, s, k - k % 2, 2, norm=n),
    'conv2': lambda i, o, k, s, n: ReLUConvBN(i, o, k, s, k // 2, norm=n, double=True),
    'conv_stride': lambda i, o, k, s, n: Conv2d(i, o, k, stride=k, bias=False, padding=int(k < 4)),
    'msa': lambda i, o, k, s, n: TransformerLayer(i, stride=s),
    'cse': lambda i, o, k, s, n: ChannelSELayer(i, dim_out=o, stride=s),
}


class AuxiliaryHead(FModule):
    """Auxiliary classifier head (reference ppuda AuxiliaryHeadCIFAR/ImageNet,
    SURVEY §2.9). ``pool_stride``/``pool_sz`` differ between CIFAR and ImageNet."""

    def __init__(self, c_in, num_classes, imagenet=True, pool_sz=5):
        super().__init__()
        stride = 2 if imagenet else 3
        self.features = Sequential(
            ReLU(),
            AvgPool2d(pool_sz if not imagenet else 5, stride=stride, padding=0,
                      count_include_pad=False),
            Conv2d(c_in, 128, 1, bias=False),
            BatchNorm2d(128),
            ReLU(),
            Conv2d(128, 768, 2, bias=False),
            BatchNorm2d(768),
            ReLU())
        self.classifier = Linear(768, num_classes)

    def __call__(self, P, x, prefix='', training=False):
        x = self.features(P, x, prefix + 'features.', training)
        x = x.reshape(x.shape[0], -1)
        return self.classifier(P, x, prefix + 'classifier.', training)


def drop_path(x, drop_prob: float, rng):
    """DARTS stochastic depth (reference ppuda drop_path): zero a sample's path
    with prob ``drop_prob`` and rescale."""
    if drop_prob <= 0 or rng is None:
        return x
    import jax
    keep = 1.0 - drop_prob
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1)).astype(x.dtype)
    return x / keep * mask


class Cell(FModule):
    """One DARTS cell: two preprocessed inputs, pairwise ops, concat of states."""

    def __init__(self, genotype: Genotype, c_prev_prev, c_prev, c_in, c_out,
                 reduction, reduction_prev, norm='bn', preproc=True, is_vit=False,
                 cell_ind=0):
        super().__init__()
        self._is_vit = is_vit
        self.genotype = genotype

        if preproc:
            if reduction_prev and not is_vit:
                self.preprocess0 = FactorizedReduce(c_prev_prev, c_out, norm=norm)
            else:
                self.preprocess0 = ReLUConvBN(c_prev_prev, c_out, norm=norm)
            self.preprocess1 = ReLUConvBN(c_prev, c_out, norm=norm)
        else:
            self.preprocess0 = Stride(stride=2) if (reduction_prev and not is_vit) else Identity()
            self.preprocess1 = Identity()

        if reduction:
            op_names, indices = zip(*genotype.reduce)
            concat = genotype.reduce_concat
        else:
            op_names, indices = zip(*genotype.normal)
            concat = genotype.normal_concat
        self._steps = len(op_names) // 2
        self._concat = list(concat)
        self.multiplier = len(concat)
        self._indices = list(indices)

        self._ops = ModuleList()
        for name, index in zip(op_names, indices):
            stride = 2 if (reduction and index < 2 and not is_vit) else 1
            base, ks = parse_op_ks(name)
            self._ops.append(OPS[base](c_in if index <= 1 else c_out, c_out, ks, stride, norm))

    def __call__(self, P, s0, s1, prefix='', training=False,
                 drop_path_prob: float = 0.0, rng=None):
        def run(mod, sub, x):
            return None if x is None else mod(P, x, prefix=f'{prefix}{sub}.', training=training)

        use_dp = training and drop_path_prob > 0 and rng is not None

        def maybe_drop(h, op):
            # DARTS stochastic depth on non-identity op outputs (reference
            # ops.py:367-375); rng is split per application
            nonlocal rng
            if not use_dp or isinstance(op, Identity) or h is None:
                return h
            rng, sub = jax.random.split(rng)
            return drop_path(h, drop_path_prob, sub)

        s0 = run(self.preprocess0, 'preprocess0', s0)
        s1 = run(self.preprocess1, 'preprocess1', s1)

        states = [s0, s1]
        for i in range(self._steps):
            h1 = states[self._indices[2 * i]]
            h2 = states[self._indices[2 * i + 1]]
            op1, op2 = self._ops[2 * i], self._ops[2 * i + 1]
            s = None
            if not (isinstance(op1, Zero) or h1 is None):
                h1 = maybe_drop(run(op1, f'_ops.{2 * i}', h1), op1)
                s = h1
            if not (isinstance(op2, Zero) or h2 is None):
                h2 = maybe_drop(run(op2, f'_ops.{2 * i + 1}', h2), op2)
                s = h2 if s is None else h1 + h2
            states.append(s)

        if any(states[i] is None for i in self._concat):
            dummy = None
            for i in self._concat:
                if states[i] is not None:
                    dummy = states[i] * 0
                    break
            if dummy is None:
                return None
            states = [dummy if (i in self._concat and states[i] is None) else states[i]
                      for i in range(len(states))]

        return jnp.concatenate([states[i] for i in self._concat], axis=1)


class Network(FModule):
    """Genotype-defined image classifier (DeepNets-1M sample space).

    Same constructor vocabulary as the dataset's `net_args` records
    (reference ops.py:403-539): C, genotype, n_cells, stems, glob_avg, fc head.
    """

    def __init__(self, C, num_classes, genotype: Genotype, n_cells, ks=3,
                 is_imagenet_input=True, stem_pool=False, stem_type=0,
                 imagenet_stride=4, is_vit=None, norm='bn-track', preproc=True,
                 C_mult=2, fc_layers=0, fc_dim=0, glob_avg=True, auxiliary=False):
        super().__init__()
        self.genotype = genotype
        self.num_classes = num_classes
        self.expected_input_sz = 224 if is_imagenet_input else 32
        self._graph_args = dict(C=C, num_classes=num_classes, n_cells=n_cells, ks=ks,
                                is_imagenet_input=is_imagenet_input, stem_pool=stem_pool,
                                stem_type=stem_type, imagenet_stride=imagenet_stride,
                                is_vit=is_vit, norm=norm, preproc=preproc, C_mult=C_mult,
                                fc_layers=fc_layers, fc_dim=fc_dim, glob_avg=glob_avg,
                                auxiliary=auxiliary)
        self._n_cells = n_cells
        self._is_vit = (sum(n[0] == 'msa' for n in genotype.normal + genotype.reduce) > 0
                        if is_vit is None else is_vit)

        steps = len(genotype.normal_concat)
        if steps > 1 or C_mult > 1:
            assert preproc, 'preprocessing layers are required for this configuration'
        assert stem_type in (0, 1), stem_type
        self._stem_type = stem_type

        c_prev_prev = c_prev = c_curr = C

        if self._is_vit:
            self.stem0 = OPS['conv_stride'](3, C, 16 if is_imagenet_input else 3, None, None)
            self.pos_enc = PosEnc(C, 14 if is_imagenet_input else 11)
        elif stem_type == 0:
            c_stem = int(C * (3 if (preproc and not is_imagenet_input) else 1))
            self.stem = Sequential(
                Conv2d(3, c_stem, ks, stride=imagenet_stride if is_imagenet_input else 1,
                       padding=ks // 2, bias=False),
                bn_layer(norm, c_stem),
                MaxPool2d(3, stride=2, padding=1) if stem_pool else Identity())
            c_prev_prev = c_prev = c_stem
        else:
            self.stem0 = Sequential(
                Conv2d(3, C // 2, kernel_size=ks, stride=2 if is_imagenet_input else 1,
                       padding=ks // 2, bias=False),
                bn_layer(norm, C // 2),
                ReLU(),
                Conv2d(C // 2, C, kernel_size=3, stride=2 if is_imagenet_input else 1,
                       padding=1, bias=False),
                bn_layer(norm, C))
            self.stem1 = Sequential(
                ReLU(),
                Conv2d(C, C, 3, stride=2, padding=1, bias=False),
                bn_layer(norm, C))

        self.cells = ModuleList()
        is_reduction = lambda ci: ci in (n_cells // 3, 2 * n_cells // 3) and ci > 0
        self._auxiliary = auxiliary
        self._auxiliary_cell_ind = 2 * n_cells // 3
        self._is_imagenet = is_imagenet_input

        reduction_prev = stem_type == 1
        for cell_ind in range(n_cells):
            reduction = is_reduction(cell_ind)
            if reduction:
                c_curr *= C_mult
            reduction_next = is_reduction(cell_ind + 1)
            cell = Cell(genotype, c_prev_prev, c_prev,
                        c_in=c_curr if preproc else c_prev,
                        c_out=c_curr * (C_mult if reduction_next and steps == 1 and not preproc else 1),
                        reduction=reduction, reduction_prev=reduction_prev, norm=norm,
                        is_vit=self._is_vit, preproc=preproc, cell_ind=cell_ind)
            self.cells.append(cell)
            reduction_prev = reduction
            c_prev_prev, c_prev = c_prev, cell.multiplier * c_curr
            if auxiliary and cell_ind == self._auxiliary_cell_ind:
                pool_sz = 2 if (stem_type == 1 or stem_pool) else 5
                self.auxiliary_head = AuxiliaryHead(c_prev, num_classes,
                                                    imagenet=is_imagenet_input,
                                                    pool_sz=pool_sz)

        self._glob_avg = glob_avg
        if glob_avg:
            self.global_pooling = AdaptiveAvgPool2d(1)
        else:
            s = (7 if (stem_type == 1 or stem_pool) else 14) if is_imagenet_input \
                else (4 if (stem_type == 1 or stem_pool) else 8)
            c_prev *= s ** 2

        fc: List[FModule] = [Linear(c_prev, fc_dim if fc_layers > 1 else num_classes)]
        for i in range(fc_layers - 1):
            assert fc_dim > 0, fc_dim
            fc.append(ReLU())
            fc.append(Dropout(0.5))
            fc.append(Linear(fc_dim, fc_dim if i < fc_layers - 2 else num_classes))
        self.classifier = Sequential(*fc)

    def __call__(self, P, x, prefix='', training=False,
                 drop_path_prob: float = 0.0, rng=None):
        if self._is_vit:
            s0 = self.stem0(P, x, prefix + 'stem0.', training)
            s0 = s1 = self.pos_enc(P, s0, prefix + 'pos_enc.', training)
        elif self._stem_type == 1:
            s0 = self.stem0(P, x, prefix + 'stem0.', training)
            s1 = self.stem1(P, s0, prefix + 'stem1.', training)
        else:
            s0 = s1 = self.stem(P, x, prefix + 'stem.', training)

        logits_aux = None
        for cell_ind, cell in enumerate(self.cells):
            cell_rng = None
            if rng is not None:
                rng, cell_rng = jax.random.split(rng)
            s0, s1 = s1, cell(P, s0, s1, prefix=f'{prefix}cells.{cell_ind}.',
                              training=training, drop_path_prob=drop_path_prob,
                              rng=cell_rng)
            if self._auxiliary and training and cell_ind == self._auxiliary_cell_ind:
                logits_aux = self.auxiliary_head(P, s1, prefix + 'auxiliary_head.', training)

        if s1 is None:
            raise ValueError('invalid network configuration: output is None')
        out = s1.mean(axis=(2, 3)) if self._glob_avg else s1.reshape(s1.shape[0], -1)
        logits = self.classifier(P, out.astype(jnp.float32), prefix + 'classifier.', training)
        return (logits, logits_aux) if logits_aux is not None else logits

    # ------------------------------------------------------------------
    # GHN target protocol
    # ------------------------------------------------------------------
    def graph_def(self, ve_cutoff: int = 50):
        """Constructive computational graph — no tracing, no torch
        (nets/darts_graph.py; verified against traced twin graphs)."""
        from .darts_graph import build_genotype_graph
        g = build_genotype_graph(self.genotype, ve_cutoff=ve_cutoff, **self._graph_args)
        g.net = self
        return g

    def param_shapes(self) -> Dict[str, tuple]:
        return {name: shape for name, shape, _ in self.named_params()}

    def param_table(self):
        """Per-cell TargetParam tables; predicted tensors are collected into
        ``self.predicted`` (a plain dict usable as the apply param dict)."""
        from ..graph.torch_trace import get_cell_ind
        from ..predict import TargetParam
        self.predicted: Dict[str, jnp.ndarray] = {}
        table = [dict() for _ in range(self._n_cells)]
        cell_ind = 0
        for name, shape, is_w in self.named_params():
            ci = get_cell_ind(name, self._n_cells)
            if ci is not None:
                cell_ind = ci

            def mk(name=name):
                def set_fn(tensor, is_weight):
                    key = name
                    if not is_weight and name.endswith('.weight'):
                        # norm bias delivered through the weight node's decode pair
                        key = name[:-len('.weight')] + '.bias'
                    self.predicted[key] = tensor if isinstance(tensor, jnp.ndarray) \
                        else jnp.asarray(tensor)
                return set_fn

            # norm weight/bias pairs share one graph node: the bias arrives through
            # the weight record's second decode row, with its own name via set_fn
            table[cell_ind][name] = TargetParam(sz=shape, is_w=is_w, set_fn=mk())
        return table
