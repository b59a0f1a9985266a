"""Constructive graph builder for genotype Networks — no torch, no tracing.

Emits the same computational graphs the autograd tracer produces for the
torch twin of a genotype Network (verified node-for-node semantics in
tests/test_darts_graph.py via permutation-invariant prediction equality),
in microseconds instead of seconds: the host-side graph compiler for the
DeepNets-1M family becomes pure construction.

Wiring patterns (empirically locked against reference-traced graphs):
  ReLUConvBN    src -> op.1 (conv) -> op.2 (bn)           [double: op.1, op.2, op.3]
  SepConv       src -> op.1 -> op.2 -> op.3 -> op.5 -> op.6 -> op.7
  DilConv       src -> op.1 -> op.2 -> op.3
  FactorizedReduce  src -> conv_1, src -> conv_2 -> concat -> bn
  pool          src -> pool-node (sz (1,1,3,3))
  msa           src -> ln1 -> to_qkv -> msa -> to_out.w -> to_out.b -> sum1;
                src -> sum1; sum1 -> ln2 -> ff0.w -> ff0.b -> ff3.w -> ff3.b -> sum2;
                sum1 -> sum2
  cse           src -> fc1.w -> fc1.b -> fc2.w -> fc2.b -> cse; src -> cse
  cell combine  both op outputs -> 2-input sum; concat only when >1 states
  ViT stem      input -> stem0 -> sum <- pos_enc (pos_enc has no input path)
  classifier    out -> glob_avg -> fc.weight -> fc.bias
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..graph.genotypes import Genotype, parse_op_ks
from ..graph.graphdef import GraphDef, NodeParam
from ..graph.primitives import PRIMITIVE_INDEX
from ..graph.shortest_paths import add_virtual_edges


class _Builder:
    def __init__(self, n_cells: int):
        self.names: List[str] = []
        self.ops: List[str] = []
        self.shapes: List[Optional[tuple]] = []
        self.cells: List[int] = []
        self.edges: List[tuple] = []
        self.n_cells = n_cells

    def node(self, op: str, name: str = '', sz=None, preds=(), cell: int = 0) -> int:
        idx = len(self.names)
        self.names.append(name)
        self.ops.append(op)
        self.shapes.append(None if sz is None else tuple(int(v) for v in sz))
        self.cells.append(cell)
        for p in preds:
            if p is not None:
                self.edges.append((p, idx))
        return idx

    def chain(self, specs, src: int, cell: int) -> int:
        """specs: [(op, name, sz), ...] wired sequentially from src."""
        for op, name, sz in specs:
            src = self.node(op, name, sz, (src,), cell)
        return src

    def finalize(self, ve_cutoff: int) -> GraphDef:
        n = len(self.names)
        adj = np.zeros((n, n), dtype=np.int32)
        for a, b in self.edges:
            adj[a, b] = 1
        adj = add_virtual_edges(adj, cutoff=ve_cutoff)
        node_op = np.array([PRIMITIVE_INDEX[o] for o in self.ops], dtype=np.int32)
        node_info = [[] for _ in range(self.n_cells)]
        param_ops = ('conv', 'sep_conv', 'dil_conv', 'bn', 'ln', 'bias', 'pos_enc')
        for i, (name, op, sz, cell) in enumerate(zip(self.names, self.ops,
                                                     self.shapes, self.cells)):
            if op in param_ops or op.find('pool') >= 0:
                node_info[cell].append(NodeParam(
                    node_ind=i, param_name=name if op in param_ops else op,
                    op=op, sz=sz,
                    is_last_weight=i == n - 2 and name.endswith('.weight'),
                    is_last_bias=i == n - 1 and name.endswith('.bias')))
        g = GraphDef(node_op=node_op, adj=adj, node_info=node_info,
                     param_shapes=list(self.shapes))
        # full per-node provenance for dataset writers (deepnets1m_writer):
        # param/op names and owning cell for EVERY node, not just param nodes
        g.builder_meta = {'names': list(self.names), 'ops': list(self.ops),
                          'cells': list(self.cells)}
        return g


def _conv_kind(cin: int, groups: int, dilation: int) -> str:
    if groups > 1:
        return 'dil_conv' if dilation > 1 else 'sep_conv'
    return 'conv'


def build_genotype_graph(genotype: Genotype, C: int, num_classes: int, n_cells: int,
                         ks: int = 3, is_imagenet_input: bool = True,
                         stem_pool: bool = False, stem_type: int = 0,
                         imagenet_stride: int = 4, is_vit=None, norm: str = 'bn',
                         preproc: bool = True, C_mult: int = 2, fc_layers: int = 0,
                         fc_dim: int = 0, glob_avg: bool = True, auxiliary: bool = False,
                         ve_cutoff: int = 50, **_ignored) -> GraphDef:
    """GraphDef for a genotype Network (nets/darts.Network constructor vocabulary)."""
    assert not auxiliary, 'aux-head graphs are not constructed (match GHN training use)'
    has_norm = norm not in (None, '', 'none')
    vit = (sum(n[0] == 'msa' for n in genotype.normal + genotype.reduce) > 0
           if is_vit is None else is_vit)
    b = _Builder(n_cells)

    def relu_conv_bn(prefix, cin, cout, k, src, cell, double=False):
        specs = []
        i = 1
        if double:
            specs.append(('conv', f'{prefix}.op.1.weight', (cin, cin, 1, k)))
            specs.append(('conv', f'{prefix}.op.2.weight', (cout, cin, k, 1)))
            i = 3
        else:
            specs.append(('conv', f'{prefix}.op.1.weight', (cout, cin, k, k)))
            i = 2
        if has_norm:
            specs.append(('bn', f'{prefix}.op.{i}.weight', (cout,)))
        return b.chain(specs, src, cell)

    def factorized_reduce(prefix, cin, cout, src, cell):
        c1 = b.node('conv', f'{prefix}.conv_1.weight', (cout // 2, cin, 1, 1), (src,), cell)
        c2 = b.node('conv', f'{prefix}.conv_2.weight', (cout // 2, cin, 1, 1), (src,), cell)
        cat = b.node('concat', '', None, (c1, c2), cell)
        if has_norm:
            cat = b.node('bn', f'{prefix}.bn.weight', (cout,), (cat,), cell)
        return cat

    def sep_conv(prefix, cin, cout, k, src, cell):
        # module indices are constant: bn_layer occupies a Sequential slot even
        # when norm is None (Identity) — reference ops.py:221-231
        specs = [('sep_conv', f'{prefix}.op.1.weight', (cin, 1, k, k)),
                 ('conv', f'{prefix}.op.2.weight', (cin, cin, 1, 1))]
        if has_norm:
            specs.append(('bn', f'{prefix}.op.3.weight', (cin,)))
        specs += [('sep_conv', f'{prefix}.op.5.weight', (cin, 1, k, k)),
                  ('conv', f'{prefix}.op.6.weight', (cout, cin, 1, 1))]
        if has_norm:
            specs.append(('bn', f'{prefix}.op.7.weight', (cout,)))
        return b.chain(specs, src, cell)

    def dil_conv(prefix, cin, cout, k, src, cell):
        specs = [('dil_conv', f'{prefix}.op.1.weight', (cin, 1, k, k)),
                 ('conv', f'{prefix}.op.2.weight', (cout, cin, 1, 1))]
        if has_norm:
            specs.append(('bn', f'{prefix}.op.3.weight', (cout,)))
        return b.chain(specs, src, cell)

    def msa(prefix, dim, src, cell):
        ln1 = b.node('ln', f'{prefix}.ln1.weight', (dim,), (src,), cell)
        qkv = b.node('conv', f'{prefix}.attn.to_qkv.weight', (dim * 3, dim), (ln1,), cell)
        att = b.node('msa', '', None, (qkv,), cell)
        ow = b.node('conv', f'{prefix}.attn.to_out.0.weight', (dim, dim), (att,), cell)
        ob = b.node('bias', f'{prefix}.attn.to_out.0.bias', (dim,), (ow,), cell)
        s1 = b.node('sum', '', None, (src, ob), cell)
        ln2 = b.node('ln', f'{prefix}.ln2.weight', (dim,), (s1,), cell)
        f0w = b.node('conv', f'{prefix}.ff.net.0.weight', (dim, dim), (ln2,), cell)
        f0b = b.node('bias', f'{prefix}.ff.net.0.bias', (dim,), (f0w,), cell)
        f3w = b.node('conv', f'{prefix}.ff.net.3.weight', (dim, dim), (f0b,), cell)
        f3b = b.node('bias', f'{prefix}.ff.net.3.bias', (dim,), (f3w,), cell)
        return b.node('sum', '', None, (s1, f3b), cell)

    def cse(prefix, dim, src, cell):
        f1w = b.node('conv', f'{prefix}.fc1.weight', (dim // 2, dim), (src,), cell)
        f1b = b.node('bias', f'{prefix}.fc1.bias', (dim // 2,), (f1w,), cell)
        f2w = b.node('conv', f'{prefix}.fc2.weight', (dim, dim // 2), (f1b,), cell)
        f2b = b.node('bias', f'{prefix}.fc2.bias', (dim,), (f2w,), cell)
        return b.node('cse', '', None, (src, f2b), cell)

    def apply_op(name, prefix, cin, cout, src, cell, reduction_stride):
        base, k = parse_op_ks(name)
        if base == 'none' or src is None:
            return None
        if base == 'skip_connect':
            return src if reduction_stride == 1 else \
                factorized_reduce(prefix, cin, cout, src, cell)
        if base in ('max_pool', 'avg_pool'):
            return b.node(base, base, (1, 1, k, k), (src,), cell)
        if base == 'conv':
            return relu_conv_bn(prefix, cin, cout, k, src, cell)
        if base == 'conv2':
            return relu_conv_bn(prefix, cin, cout, k, src, cell, double=True)
        if base == 'sep_conv':
            return sep_conv(prefix, cin, cout, k, src, cell)
        if base == 'dil_conv':
            return dil_conv(prefix, cin, cout, k, src, cell)
        if base == 'msa':
            return msa(prefix, cin, src, cell)
        if base == 'cse':
            return cse(prefix, cin, src, cell)
        raise NotImplementedError(base)

    # ---- stem ----------------------------------------------------------
    inp = b.node('input', 'input', None)
    c_prev_prev = c_prev = c_curr = C
    if vit:
        patch = 16 if is_imagenet_input else 3
        stem = b.node('conv', 'stem0.weight', (C, 3, patch, patch), (inp,))
        pe_k = 14 if is_imagenet_input else 11
        pe = b.node('pos_enc', 'pos_enc.weight', (1, C, pe_k, pe_k))
        s0 = s1 = b.node('sum', '', None, (stem, pe))
    elif stem_type == 0:
        c_stem = int(C * (3 if (preproc and not is_imagenet_input) else 1))
        src = b.node('conv', 'stem.0.weight', (c_stem, 3, ks, ks), (inp,))
        if has_norm:
            src = b.node('bn', 'stem.1.weight', (c_stem,), (src,))
        if stem_pool:
            src = b.node('max_pool', 'max_pool', (1, 1, 3, 3), (src,))
        s0 = s1 = src
        c_prev_prev = c_prev = c_stem
    else:
        src = b.node('conv', 'stem0.0.weight', (C // 2, 3, ks, ks), (inp,))
        if has_norm:
            src = b.node('bn', 'stem0.1.weight', (C // 2,), (src,))
        # module indices are constant: bn_layer occupies a Sequential slot even
        # when norm is None (Identity) — second conv is always stem0.3 (matches
        # the published dataset naming, reference deepnets1m.py:178 'stem0.3')
        src = b.node('conv', 'stem0.3.weight', (C, C // 2, 3, 3), (src,))
        if has_norm:
            src = b.node('bn', 'stem0.4.weight', (C,), (src,))
        s0 = src
        j = 1
        src = b.node('conv', f'stem1.{j}.weight', (C, C, 3, 3), (s0,))
        if has_norm:
            src = b.node('bn', f'stem1.{j + 1}.weight', (C,), (src,))
        s1 = src

    # ---- cells ---------------------------------------------------------
    steps_concat = len(genotype.normal_concat)
    is_reduction = lambda ci: ci in (n_cells // 3, 2 * n_cells // 3) and ci > 0
    reduction_prev = stem_type == 1
    for cell in range(n_cells):
        reduction = is_reduction(cell)
        if reduction:
            c_curr *= C_mult
        reduction_next = is_reduction(cell + 1)
        c_in = c_curr if preproc else c_prev
        c_out = c_curr * (C_mult if reduction_next and steps_concat == 1 and not preproc else 1)

        if preproc:
            if reduction_prev and not vit:
                p0 = None if s0 is None else factorized_reduce(
                    f'cells.{cell}.preprocess0', c_prev_prev, c_out, s0, cell)
            else:
                p0 = None if s0 is None else relu_conv_bn(
                    f'cells.{cell}.preprocess0', c_prev_prev, c_out, 1, s0, cell)
            p1 = None if s1 is None else relu_conv_bn(
                f'cells.{cell}.preprocess1', c_prev, c_out, 1, s1, cell)
        else:
            p0, p1 = s0, s1  # Stride/Identity: no nodes

        pairs = genotype.reduce if reduction else genotype.normal
        concat = genotype.reduce_concat if reduction else genotype.normal_concat
        op_names, indices = zip(*pairs)
        states = [p0, p1]
        for i in range(len(op_names) // 2):
            outs = []
            for j in (2 * i, 2 * i + 1):
                idx = indices[j]
                stride = 2 if (reduction and idx < 2 and not vit) else 1
                h = apply_op(op_names[j], f'cells.{cell}._ops.{j}',
                             c_in if idx <= 1 else c_out, c_out, states[idx], cell,
                             stride)
                outs.append(h)
            o1, o2 = outs
            if o1 is None and o2 is None:
                states.append(None)
            elif o1 is None or o2 is None or o1 == o2:
                states.append(o1 if o2 is None else o2)
            else:
                states.append(b.node('sum', '', None, (o1, o2), cell))

        concat_states = [states[i] for i in concat if states[i] is not None]
        if len(concat_states) == 0:
            out = None
        elif len(concat_states) == 1:
            out = concat_states[0]
        else:
            out = b.node('concat', '', None, tuple(concat_states), cell)

        reduction_prev = reduction
        s0, s1 = s1, out
        c_prev_prev, c_prev = c_prev, len(concat) * c_curr

    # ---- classifier ----------------------------------------------------
    assert s1 is not None, 'network output is None'
    head_cell = n_cells - 1
    src = s1
    if glob_avg:
        src = b.node('glob_avg', '', None, (src,), head_cell)
        feat = c_prev
    else:
        s = (7 if (stem_type == 1 or stem_pool) else 14) if is_imagenet_input \
            else (4 if (stem_type == 1 or stem_pool) else 8)
        feat = c_prev * s * s

    dims = [feat] + [fc_dim] * max(0, fc_layers - 1) + [num_classes] \
        if fc_layers > 1 else [feat, num_classes]
    mod_idx = 0
    for li in range(len(dims) - 1):
        src = b.node('conv', f'classifier.{mod_idx}.weight', (dims[li + 1], dims[li]),
                     (src,), head_cell)
        src = b.node('bias', f'classifier.{mod_idx}.bias', (dims[li + 1],),
                     (src,), head_cell)
        mod_idx += 3  # Linear, ReLU, Dropout

    return b.finalize(ve_cutoff)
