"""Torch twin of the genotype Network family (graph source / torch execution).

Mirrors nets/darts.py with torch modules and identical parameter names, so:
* any genotype network gets a GraphDef through the golden-tested tracer without
  DeepNets-1M files (e.g. the `predefined` split, or ad-hoc genotypes);
* torch users get the reference's `Network` surface (SURVEY §2 row 8) while the
  functional twin executes the same predicted parameters on TPU.

Imports torch lazily; nothing else in the framework depends on this module.
"""

from __future__ import annotations

from ..graph.genotypes import Genotype, parse_op_ks


def build_torch_network(genotype: Genotype, C=32, num_classes=10, n_cells=4, ks=3,
                        is_imagenet_input=False, stem_pool=False, stem_type=0,
                        imagenet_stride=4, is_vit=None, norm='bn', preproc=True,
                        C_mult=2, fc_layers=0, fc_dim=0, glob_avg=True,
                        auxiliary=False, **_ignored):
    """Construct a torch nn.Module structurally identical to nets/darts.Network."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def bn_layer(norm_, c):
        if norm_ in (None, '', 'none'):
            return nn.Identity()
        if norm_.startswith('bn'):
            return nn.BatchNorm2d(c, track_running_stats=norm_.find('track') >= 0)
        raise NotImplementedError(norm_)

    class Stride(nn.Module):
        def __init__(self, stride):
            super().__init__()
            self.stride = stride

        def forward(self, x):
            return x if self.stride == 1 else x[:, :, ::self.stride, ::self.stride]

    class Zero(nn.Module):
        def __init__(self, stride):
            super().__init__()
            self.stride = stride

        def forward(self, x):
            x = x if self.stride == 1 else x[:, :, ::self.stride, ::self.stride]
            return x * 0.0

    class FactorizedReduce(nn.Module):
        def __init__(self, c_in, c_out, norm_='bn', stride=2):
            super().__init__()
            self.stride = stride
            self.conv_1 = nn.Conv2d(c_in, c_out // 2, 1, stride=stride, bias=False)
            self.conv_2 = nn.Conv2d(c_in, c_out // 2, 1, stride=stride, bias=False)
            self.bn = bn_layer(norm_, c_out)

        def forward(self, x):
            x = F.relu(x)
            x2 = x[:, :, 1:, 1:] if self.stride > 1 else x
            return self.bn(torch.cat([self.conv_1(x), self.conv_2(x2)], dim=1))

    class ReLUConvBN(nn.Module):
        def __init__(self, c_in, c_out, k=1, stride=1, padding=0, norm_='bn', double=False):
            super().__init__()
            if double:
                convs = [nn.Conv2d(c_in, c_in, (1, k), stride=(1, stride),
                                   padding=(0, padding), bias=False),
                         nn.Conv2d(c_in, c_out, (k, 1), stride=(stride, 1),
                                   padding=(padding, 0), bias=False)]
            else:
                convs = [nn.Conv2d(c_in, c_out, k, stride=stride, padding=padding, bias=False)]
            self.op = nn.Sequential(nn.ReLU(), *convs, bn_layer(norm_, c_out))

        def forward(self, x):
            return self.op(x)

    class DilConv(nn.Module):
        def __init__(self, c_in, c_out, k, stride, padding, dilation, norm_='bn'):
            super().__init__()
            self.op = nn.Sequential(
                nn.ReLU(),
                nn.Conv2d(c_in, c_in, k, stride=stride, padding=padding,
                          dilation=dilation, groups=c_in, bias=False),
                nn.Conv2d(c_in, c_out, 1, bias=False),
                bn_layer(norm_, c_out))

        def forward(self, x):
            return self.op(x)

    class SepConv(nn.Module):
        def __init__(self, c_in, c_out, k, stride, padding, norm_='bn'):
            super().__init__()
            self.op = nn.Sequential(
                nn.ReLU(),
                nn.Conv2d(c_in, c_in, k, stride=stride, padding=padding, groups=c_in, bias=False),
                nn.Conv2d(c_in, c_in, 1, bias=False),
                bn_layer(norm_, c_in),
                nn.ReLU(),
                nn.Conv2d(c_in, c_in, k, stride=1, padding=padding, groups=c_in, bias=False),
                nn.Conv2d(c_in, c_out, 1, bias=False),
                bn_layer(norm_, c_out))

        def forward(self, x):
            return self.op(x)

    class ChannelSELayer(nn.Module):
        def __init__(self, c, reduction_ratio=2, dim_out=None, stride=1):
            super().__init__()
            self.stride = stride
            self.fc1 = nn.Linear(c, c // reduction_ratio)
            self.fc2 = nn.Linear(c // reduction_ratio, c)

        def forward(self, x):
            s = x.reshape(*x.shape[:2], -1).mean(-1)
            s = F.hardswish(self.fc2(F.relu(self.fc1(s))))
            y = x * s[:, :, None, None]
            return y if self.stride == 1 else y[:, :, ::self.stride, ::self.stride]

    class MSA(nn.Module):
        def __init__(self, dim, heads=8):
            super().__init__()
            self.heads = heads
            self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
            self.to_out = nn.Sequential(nn.Linear(dim, dim))

        def forward(self, x):
            b, n, c = x.shape
            h = self.heads
            qkv = self.to_qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = ((q @ k.transpose(-2, -1)) * (c // h) ** -0.5).softmax(dim=-1)
            return self.to_out((att @ v).transpose(1, 2).reshape(b, n, c))

    class FF(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Identity(),
                                     nn.Linear(hidden, dim), nn.Identity())

        def forward(self, x):
            return self.net(x)

    class TransformerLayer(nn.Module):
        def __init__(self, dim, stride=1):
            super().__init__()
            self.stride = stride
            self.ln1 = nn.LayerNorm(dim)
            self.attn = MSA(dim)
            self.ln2 = nn.LayerNorm(dim)
            self.ff = FF(dim, dim)

        def forward(self, x):
            sz = x.shape
            if len(sz) == 4:
                x = x.reshape(sz[0], sz[1], -1).permute(0, 2, 1)
            x = x + self.attn(self.ln1(x))
            x = x + self.ff(self.ln2(x))
            if len(sz) == 4:
                x = x.permute(0, 2, 1).reshape(sz[0], x.shape[2], sz[2], sz[3])
                if self.stride > 1:
                    x = x[:, :, ::self.stride, ::self.stride]
            return x

    class PosEnc(nn.Module):
        def __init__(self, c, k):
            super().__init__()
            self.weight = nn.Parameter(torch.randn(1, c, k, k))

        def forward(self, x):
            return x + self.weight

    OPS = {
        'none': lambda i, o, k, s, n: Zero(s),
        'skip_connect': lambda i, o, k, s, n: nn.Identity() if s == 1 else FactorizedReduce(i, o, norm_=n),
        'avg_pool': lambda i, o, k, s, n: nn.AvgPool2d(k, stride=s, padding=k // 2, count_include_pad=False),
        'max_pool': lambda i, o, k, s, n: nn.MaxPool2d(k, stride=s, padding=k // 2),
        'conv': lambda i, o, k, s, n: ReLUConvBN(i, o, k, s, k // 2, norm_=n),
        'sep_conv': lambda i, o, k, s, n: SepConv(i, o, k, s, k // 2, norm_=n),
        'dil_conv': lambda i, o, k, s, n: DilConv(i, o, k, s, k - k % 2, 2, norm_=n),
        'conv2': lambda i, o, k, s, n: ReLUConvBN(i, o, k, s, k // 2, norm_=n, double=True),
        'conv_stride': lambda i, o, k, s, n: nn.Conv2d(i, o, k, stride=k, bias=False, padding=int(k < 4)),
        'msa': lambda i, o, k, s, n: TransformerLayer(i, stride=s),
        'cse': lambda i, o, k, s, n: ChannelSELayer(i, dim_out=o, stride=s),
    }

    class Cell(nn.Module):
        def __init__(self, c_prev_prev, c_prev, c_in, c_out, reduction, reduction_prev, is_vit_):
            super().__init__()
            if preproc:
                if reduction_prev and not is_vit_:
                    self.preprocess0 = FactorizedReduce(c_prev_prev, c_out, norm_=norm)
                else:
                    self.preprocess0 = ReLUConvBN(c_prev_prev, c_out, norm_=norm)
                self.preprocess1 = ReLUConvBN(c_prev, c_out, norm_=norm)
            else:
                self.preprocess0 = Stride(2) if (reduction_prev and not is_vit_) else nn.Identity()
                self.preprocess1 = nn.Identity()

            pairs = genotype.reduce if reduction else genotype.normal
            concat = genotype.reduce_concat if reduction else genotype.normal_concat
            op_names, indices = zip(*pairs)
            self._steps = len(op_names) // 2
            self._concat = list(concat)
            self.multiplier = len(concat)
            self._indices = list(indices)
            self._ops = nn.ModuleList()
            for name, index in zip(op_names, indices):
                stride = 2 if (reduction and index < 2 and not is_vit_) else 1
                base, k = parse_op_ks(name)
                self._ops.append(OPS[base](c_in if index <= 1 else c_out, c_out, k, stride, norm))

        def forward(self, s0, s1):
            s0 = None if s0 is None else self.preprocess0(s0)
            s1 = None if s1 is None else self.preprocess1(s1)
            states = [s0, s1]
            for i in range(self._steps):
                h1 = states[self._indices[2 * i]]
                h2 = states[self._indices[2 * i + 1]]
                op1, op2 = self._ops[2 * i], self._ops[2 * i + 1]
                s = None
                if not (isinstance(op1, Zero) or h1 is None):
                    s = h1 = op1(h1)
                if not (isinstance(op2, Zero) or h2 is None):
                    h2 = op2(h2)
                    s = h2 if s is None else h1 + h2
                states.append(s)
            if any(states[i] is None for i in self._concat):
                dummy = next((states[i] * 0 for i in self._concat if states[i] is not None), None)
                if dummy is None:
                    return None
                states = [dummy if (i in self._concat and states[i] is None) else states[i]
                          for i in range(len(states))]
            return torch.cat([states[i] for i in self._concat], dim=1)

    class Network(nn.Module):
        def __init__(self):
            super().__init__()
            self._n_cells = n_cells
            self.expected_input_sz = 224 if is_imagenet_input else 32
            vit = (sum(n[0] == 'msa' for n in genotype.normal + genotype.reduce) > 0
                   if is_vit is None else is_vit)
            self._is_vit = vit
            steps = len(genotype.normal_concat)
            c_prev_prev = c_prev = c_curr = C

            if vit:
                self.stem0 = OPS['conv_stride'](3, C, 16 if is_imagenet_input else 3, None, None)
                self.pos_enc = PosEnc(C, 14 if is_imagenet_input else 11)
            elif stem_type == 0:
                c_stem = int(C * (3 if (preproc and not is_imagenet_input) else 1))
                self.stem = nn.Sequential(
                    nn.Conv2d(3, c_stem, ks, stride=imagenet_stride if is_imagenet_input else 1,
                              padding=ks // 2, bias=False),
                    bn_layer(norm, c_stem),
                    nn.MaxPool2d(3, stride=2, padding=1) if stem_pool else nn.Identity())
                c_prev_prev = c_prev = c_stem
            else:
                self.stem0 = nn.Sequential(
                    nn.Conv2d(3, C // 2, ks, stride=2 if is_imagenet_input else 1,
                              padding=ks // 2, bias=False),
                    bn_layer(norm, C // 2),
                    nn.ReLU(),
                    nn.Conv2d(C // 2, C, 3, stride=2 if is_imagenet_input else 1,
                              padding=1, bias=False),
                    bn_layer(norm, C))
                self.stem1 = nn.Sequential(
                    nn.ReLU(),
                    nn.Conv2d(C, C, 3, stride=2, padding=1, bias=False),
                    bn_layer(norm, C))

            self.cells = nn.ModuleList()
            is_reduction = lambda ci: ci in (n_cells // 3, 2 * n_cells // 3) and ci > 0
            reduction_prev = stem_type == 1
            for cell_ind in range(n_cells):
                reduction = is_reduction(cell_ind)
                if reduction:
                    c_curr *= C_mult
                reduction_next = is_reduction(cell_ind + 1)
                cell = Cell(c_prev_prev, c_prev,
                            c_in=c_curr if preproc else c_prev,
                            c_out=c_curr * (C_mult if reduction_next and steps == 1 and not preproc else 1),
                            reduction=reduction, reduction_prev=reduction_prev, is_vit_=vit)
                self.cells.append(cell)
                reduction_prev = reduction
                c_prev_prev, c_prev = c_prev, cell.multiplier * c_curr
                if auxiliary and cell_ind == 2 * n_cells // 3:
                    # aux classifier head, structurally identical to
                    # nets/darts.AuxiliaryHead (ppuda AuxiliaryHead*, SURVEY §2.9)
                    stride = 2 if is_imagenet_input else 3
                    pool_sz = 2 if (stem_type == 1 or stem_pool) else 5
                    self.auxiliary_head = nn.Module()
                    self.auxiliary_head.features = nn.Sequential(
                        nn.ReLU(),
                        nn.AvgPool2d(pool_sz if not is_imagenet_input else 5,
                                     stride=stride, padding=0,
                                     count_include_pad=False),
                        nn.Conv2d(c_prev, 128, 1, bias=False),
                        nn.BatchNorm2d(128),
                        nn.ReLU(),
                        nn.Conv2d(128, 768, 2, bias=False),
                        nn.BatchNorm2d(768),
                        nn.ReLU())
                    self.auxiliary_head.classifier = nn.Linear(768, num_classes)
            self._auxiliary = auxiliary
            self._auxiliary_cell_ind = 2 * n_cells // 3

            self._glob_avg = glob_avg
            if not glob_avg:
                s = (7 if (stem_type == 1 or stem_pool) else 14) if is_imagenet_input \
                    else (4 if (stem_type == 1 or stem_pool) else 8)
                c_prev *= s ** 2
            fc = [nn.Linear(c_prev, fc_dim if fc_layers > 1 else num_classes)]
            for i in range(fc_layers - 1):
                fc += [nn.ReLU(), nn.Dropout(0.5),
                       nn.Linear(fc_dim, fc_dim if i < fc_layers - 2 else num_classes)]
            self.classifier = nn.Sequential(*fc)
            self._stem_type = stem_type

        def forward(self, x):
            if self._is_vit:
                s0 = s1 = self.pos_enc(self.stem0(x))
            elif self._stem_type == 1:
                s0 = self.stem0(x)
                s1 = self.stem1(s0)
            else:
                s0 = s1 = self.stem(x)
            logits_aux = None
            for cell_ind, cell in enumerate(self.cells):
                s0, s1 = s1, cell(s0, s1)
                if self._auxiliary and self.training and \
                        cell_ind == self._auxiliary_cell_ind:
                    a = self.auxiliary_head.features(s1)
                    logits_aux = self.auxiliary_head.classifier(a.view(a.size(0), -1))
            out = s1.mean(dim=(2, 3)) if self._glob_avg else s1.reshape(s1.size(0), -1)
            logits = self.classifier(out)
            return (logits, logits_aux) if logits_aux is not None else logits

    return Network()
