"""PyTorch-model frontend: builds a GraphDef for an arbitrary ``nn.Module``.

Host-side only (imports torch lazily). Reproduces the observable graph semantics of
the reference builder (/root/reference/ghn3/graph.py:392-908): an autograd-trace walk
from the model output, followed by node filtering, weight/softmax edge rewiring,
input-node insertion, topological sort, virtual edges, and feature construction.
The pretrained GHN checkpoints were trained against exactly these graph semantics,
so every heuristic here is behavior-matched (and covered by golden parity tests
in tests/test_trace_parity.py).

The output is a plain-numpy :class:`GraphDef`; nothing in this module touches JAX.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .graphdef import GraphDef, NodeParam
from .primitives import PRIMITIVE_INDEX
from .shortest_paths import add_virtual_edges


def _conv_primitive(module, op_name: str) -> str:
    if op_name.find('bias') >= 0:
        return 'bias'
    import torch.nn as nn
    if isinstance(module, nn.Conv2d) and module.groups > 1:
        dil = module.dilation if isinstance(module.dilation, (tuple, list)) else (module.dilation,)
        return 'dil_conv' if min(dil) > 1 else 'sep_conv'
    return 'conv'


def _module_primitive(module, op_name: str) -> Optional[str]:
    """Map a leaf torch module to a primitive name; None if unsupported."""
    import torch.nn as nn
    cls_name = type(module).__name__

    if isinstance(module, (nn.Conv2d, nn.Linear, nn.MultiheadAttention)) or cls_name in (
            'NonDynamicallyQuantizableLinear', 'Conv1D'):
        return _conv_primitive(module, op_name)
    if isinstance(module, nn.BatchNorm2d):
        return 'bn'
    if cls_name == 'LayerNorm2d':
        return 'ln'
    if isinstance(module, nn.LayerNorm):
        return 'ln'
    if isinstance(module, nn.Embedding):
        return 'pos_enc'
    if cls_name in ('PosEnc', 'Encoder'):  # any pos-enc-style module, torchvision ViT Encoder
        return 'pos_enc'
    return None


# grad_fn op name (before 'Backward') -> primitive
_BACKWARD_OP_PRIMITIVE = {
    'input': 'input',
    'Mean': 'glob_avg',
    'AdaptiveAvgPool2D': 'glob_avg',
    'MaxPool2DWithIndices': 'max_pool',
    'AvgPool2D': 'avg_pool',
    'Softmax': 'msa',
    'Mul': 'cse',
    'Add': 'sum',
    'Cat': 'concat',
    'skip_connect': 'sum',
}


def _op_key(param_name: str) -> str:
    ind = param_name.find('Backward')
    return param_name[:len(param_name) if ind == -1 else ind]


_SAVED_ATTRS_BY_TYPE: Dict[type, Tuple[str, ...]] = {}


def _saved_attrs(fn) -> Dict[str, str]:
    import torch
    t = type(fn)
    names = _SAVED_ATTRS_BY_TYPE.get(t)
    if names is None:
        names = tuple(a for a in dir(fn) if a.startswith('_saved_'))
        _SAVED_ATTRS_BY_TYPE[t] = names
    attrs = {}
    for attr in names:
        try:
            val = getattr(fn, attr)
        except RuntimeError:
            continue  # saved tensor already freed
        key = attr[len('_saved_'):]
        if torch.is_tensor(val):
            attrs[key] = '[saved tensor]'
        elif isinstance(val, tuple) and any(torch.is_tensor(t_) for t_ in val):
            attrs[key] = '[saved tensors]'
        else:
            attrs[key] = str(val)
    return attrs


class _Node:
    __slots__ = ('param_name', 'attrs', 'module')

    def __init__(self, param_name, attrs, module):
        self.param_name = param_name
        self.attrs = attrs
        self.module = module


def expected_input_size(model) -> Tuple[int, int, int]:
    sz = getattr(model, 'expected_input_sz', None)
    if sz is None:
        sz = 299 if type(model).__name__ == 'Inception3' else 224
    return tuple(sz) if isinstance(sz, (tuple, list)) else (3, sz, sz)


def _autograd_walk(model, input_sz):
    """Walk grad_fn graph backward from the output. Returns (nodes, A)."""
    import torch

    # param identity -> (name, owning module); for tied weights the LAST name
    # wins (reference _named_modules dict iteration order, graph.py:400,917-925)
    param_map = {}
    for mod_name, m in model.named_modules():
        for p_name, p in m.named_parameters(recurse=False):
            if p is None:
                continue
            param_map[id(p)] = (mod_name + '.' + p_name, m)

    nodes: Dict[str, _Node] = {}
    edges: List[Tuple[str, str]] = []
    seen: Dict[Any, Tuple[Optional[str], str]] = {}

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))  # large traces (e.g. efficientnet_v2_l)

    def visit(fn):
        if fn in seen:
            return seen[fn]
        fn_name = str(type(fn).__name__)
        node_link = None
        link_start = None
        if fn_name.find('AccumulateGrad') < 0:
            leaves = []
            for u in getattr(fn, 'next_functions', ()):
                for uu in u:
                    if uu is None or isinstance(uu, int):
                        continue
                    if hasattr(uu, 'variable'):
                        var = uu.variable
                        if id(var) not in param_map:
                            # matches the reference's contract (graph.py:443): every
                            # differentiable leaf must be a registered parameter —
                            # but fail with an actionable message, not a KeyError
                            raise ValueError(
                                'traced a differentiable leaf tensor of shape '
                                f'{tuple(var.size())} that is not a registered '
                                'parameter of the model; register it via '
                                'nn.Parameter/register_parameter or detach it '
                                '(GHNs can only predict named parameters)')
                        name, module = param_map[id(var)]
                        leaves.append((uu, name, {'size': tuple(var.size()), **_saved_attrs(var)}, module))
            if not leaves:
                leaves.append((fn, fn_name, _saved_attrs(fn), None))
            for leaf_id, name, attrs, module in leaves:
                node_link = str(id(leaf_id))
                if link_start is None:
                    link_start = node_link
                seen[leaf_id] = (node_link, name)
                nodes[node_link] = _Node(name, attrs, module)
        seen[fn] = (node_link, fn_name)

        for u in getattr(fn, 'next_functions', ()):
            for uu in u:
                if uu is not None and not isinstance(uu, int):
                    link, name = visit(uu)
                    if link is not None and link_start != link:
                        # bias params hang off their op: op -> bias; everything else
                        # feeds forward into this op
                        if name.find('bias') >= 0:
                            edges.append((link_start, link))
                        else:
                            edges.append((link, link_start))
        return node_link, fn_name

    params = list(model.parameters())
    device = params[0].device if params else 'cpu'
    with torch.enable_grad():
        if hasattr(model, 'get_var'):
            out = model.get_var()
        else:
            out = model(torch.randn(2, *input_sz, device=device))
        if isinstance(out, dict):
            out = list(out.values())
        if not isinstance(out, (tuple, list)):
            out = [out]
        for v in out:
            if v is not None:
                visit(v.grad_fn)

    sys.setrecursionlimit(old_limit)

    lookup = {key: i for i, key in enumerate(nodes)}
    node_list = [nodes[key] for key in lookup]
    A = np.zeros((len(node_list), len(node_list)), dtype=np.int32)
    for src, dst in edges:
        A[lookup[src], lookup[dst]] = 1
    return node_list, A


def _derive_unsupported(nodes: List[_Node]) -> List[str]:
    """Patterns of node names to remove (reference semantics graph.py:658-683):
    anything that is neither a supported module nor a recognized backward op.
    Norm-layer bias nodes are removed too (their params are still predicted via the
    weight node's two-channel 1d decode)."""
    unsupported = set()
    for node in nodes:
        op = _op_key(node.param_name)
        supported = False
        mod_cls = type(node.module).__name__.lower()
        if mod_cls.find('norm') >= 0 and op.endswith('.bias'):
            pass  # norm bias: not a graph node
        else:
            supported = node.module is not None and _module_primitive(node.module, node.param_name) is not None
        if not supported and op not in _BACKWARD_OP_PRIMITIVE:
            unsupported.add(node.param_name)
    return ['Mul'] + sorted(unsupported) + ['Mean', 'Add', 'Cat']


def _filter_graph(nodes: List[_Node], A: np.ndarray,
                  patterns: Optional[List[str]] = None) -> Tuple[List[_Node], np.ndarray]:
    """Remove redundant/unsupported nodes, rewiring edges through them
    (reference graph.py:648-753)."""
    if patterns is None:
        patterns = _derive_unsupported(nodes)

    has_cse = any(n.param_name.lower().find('sigmoid') >= 0 or n.param_name.lower().find('swish') >= 0
                  for n in nodes)
    n_in = [int((A[:, i] != 0).sum()) for i in range(len(nodes))]

    for pattern in patterns:
        keep_idx = []
        for i, node in enumerate(nodes):
            keep = True
            name = node.param_name
            if name.find(pattern) >= 0:
                try:
                    # NOTE: for i < 3 the negative offsets WRAP AROUND to the end
                    # of the node list. This reproduces the reference's Python
                    # indexing behavior (graph.py:~700 neighbor window) on
                    # purpose — the pretrained checkpoints were trained on graphs
                    # built this way, so "fixing" it would break parity
                    # (tests/test_trace_parity.py::test_neighbor_window_wraparound_locked).
                    neigh = {j: nodes[i + j].param_name.lower() for j in (-1, -2, -3, 1)}
                    clf_head = any(neigh[j].startswith(('classifier', 'fc', 'head')) for j in (-1, -2))
                except Exception:
                    clf_head = True
                if name.startswith('Mean'):
                    keep = clf_head if has_cse else True
                elif name.startswith('Mul'):
                    keep = (has_cse and not clf_head and
                            (neigh[-2].startswith(('hard', 'sigmoid')) or
                             neigh[-3].startswith(('relu', 'mean')) or
                             neigh[1].startswith(('hard', 'sigmoid', 'relu'))))
                elif name.startswith(('Cat', 'Add')):
                    keep = n_in[i] > 1
                else:
                    keep = False
                if not keep:
                    outs = np.where(A[i, :])[0]
                    ins = np.where(A[:, i])[0]
                    for n1 in outs:
                        for n2 in ins:
                            if n1 != n2:
                                A[n2, n1] = 1
            if keep:
                keep_idx.append(i)
        if len(keep_idx) < A.shape[0]:
            keep_idx = np.array(keep_idx)
            A = A[keep_idx][:, keep_idx]
            nodes = [nodes[i] for i in keep_idx]
            n_in = [n_in[i] for i in keep_idx]
    return nodes, A


def _fix_weight_edges(nodes: List[_Node], A: np.ndarray) -> None:
    """Rewire weight leaf nodes that ended up with reversed edges
    (reference graph.py:511-551). Mutates A / nodes in place."""
    for i, node in enumerate(nodes):
        if A[:, i].sum() > 0:
            continue
        if node.param_name.find('weight') < 0:
            continue
        for out_neigh in np.where(A[i, :])[0]:
            same_layer = node.module is nodes[out_neigh].module and node.module is not None
            qkv = (len(np.where(A[:, i])[0]) == 0 and
                   nodes[out_neigh].param_name.lower().find('softmax') >= 0)
            if not (same_layer or qkv):
                continue
            n_out = len(np.where(A[i, :])[0])
            in_out = np.setdiff1d(np.where(A[:, out_neigh])[0], i)
            if len(in_out) == 0:
                continue
            nodes[i], nodes[out_neigh] = nodes[out_neigh], nodes[i]
            A[i, out_neigh], A[out_neigh, i] = 0, 1
            if n_out == 1:
                out_new = np.setdiff1d(np.where(A[out_neigh, :])[0], i)
                if len(out_new) == 0:
                    continue
                A[out_neigh, out_new] = 0
                A[i, out_new] = 1


def _count_simple_paths(A: np.ndarray, src: int, dst: int, limit: int = 2) -> int:
    """Count simple paths src->dst in a DAG, early-exit at ``limit``.

    DFS restricted to nodes that can reach ``dst`` (reverse BFS pruning), so the
    work is bounded by ``limit`` path explorations instead of the whole sub-DAG.
    """
    a = A > 0
    n = a.shape[0]
    reaches = np.zeros(n, dtype=bool)
    reaches[dst] = True
    frontier = [dst]
    while frontier:
        v = frontier.pop()
        for u in np.where(a[:, v])[0]:
            if not reaches[u]:
                reaches[u] = True
                frontier.append(int(u))
    if not reaches[src]:
        return 0
    count = 0
    stack = [src]
    while stack and count < limit:
        u = stack.pop()
        if u == dst:
            count += 1
            continue
        for v in np.where(a[u])[0]:
            if reaches[v]:
                stack.append(int(v))
    return count


def _fix_softmax_edges(nodes: List[_Node], A: np.ndarray) -> None:
    """Make softmax/msa wiring consistent with DeepNets-1M DAGs
    (reference graph.py:553-574)."""
    for i, node in enumerate(nodes):
        if node.param_name.lower().find('softmax') < 0:
            continue
        for out_neigh in np.where(A[i, :])[0]:
            in_out = np.setdiff1d(np.where(A[:, out_neigh])[0], i)
            for j in in_out:
                n_paths = _count_simple_paths(A, int(j), int(out_neigh), limit=2)
                if n_paths > 1 or A[i, j] == 0:
                    A[j, out_neigh] = 0
                if n_paths == 1 and A[i, j] == 0:
                    A[j, i] = 1


def _fix_swin_edges(model, nodes: List[_Node], A: np.ndarray) -> None:
    """SwinTransformer-specific manual edge fixes (reference graph.py:579-598)."""
    if type(model).__name__ != 'SwinTransformer':
        return
    for i, node in enumerate(nodes):
        pname = node.param_name.lower()
        if pname.endswith('norm.weight'):
            for out_neigh in np.where(A[i, :])[0]:
                if (nodes[out_neigh].param_name.endswith('norm1.weight') or
                        nodes[out_neigh].param_name.find('Add') >= 0):
                    A[i, out_neigh] = 0
                    target = node.param_name.replace('norm', 'reduction')
                    for j, node2 in enumerate(nodes):
                        if node2.param_name.find(target) >= 0:
                            A[i, j] = 1
                            break
        elif pname.endswith('attn.proj.bias'):
            for out_neigh in np.where(A[i, :])[0]:
                if nodes[out_neigh].param_name.endswith('reduction.weight'):
                    A[i, out_neigh] = 0
                    for out_neigh2 in np.where(A[out_neigh, :])[0]:
                        if nodes[out_neigh2].param_name.startswith('AddBackward'):
                            A[i, out_neigh2] = 1


def get_cell_ind(param_name: str, layers: int = 1) -> Optional[int]:
    """Parse the cell index from a parameter name (ppuda surface, SURVEY §2.9)."""
    if param_name.find('cells.') >= 0:
        sub = param_name[param_name.find('cells.') + len('cells.'):]
        p = sub.find('.')
        return int(sub if p == -1 else sub[:p])
    if param_name.startswith('classifier') or param_name.startswith('auxiliary'):
        return layers - 1
    if layers == 1 or param_name.startswith('stem') or param_name.startswith('pos_enc'):
        return 0
    return None


def _normalize_ops_path(param_name: str) -> str:
    """Insert the '.op.' component into DARTS-style '_ops.<i>.<j>' paths so names
    match the DeepNets-1M convention (reference graph.py:832-841)."""
    parts = param_name.split('.')
    for i, s in enumerate(parts):
        if s == '_ops' and i + 2 < len(parts) and parts[i + 2] != 'op':
            try:
                int(parts[i + 2])
            except ValueError:
                continue
            parts.insert(i + 2, 'op')
            return '.'.join(parts)
    return param_name


def _construct_features(nodes: List[_Node], A: np.ndarray, n_cells: int,
                        verbose: bool) -> Tuple[np.ndarray, List[List[NodeParam]], List]:
    """Build node primitive ids, per-cell parameter metadata, and shape hints
    (reference graph.py:800-908)."""
    n = len(nodes)
    node_op = np.zeros(n, dtype=np.int32)
    node_info: List[List[NodeParam]] = [[] for _ in range(n_cells)]
    param_shapes: List[Optional[Tuple[int, ...]]] = []

    n_glob_avg = 0
    cell_ind = 0
    for node_ind, node in enumerate(nodes):
        param_name = node.param_name
        ci = get_cell_ind(param_name, n_cells)
        if ci is not None:
            cell_ind = ci

        pos_stem = param_name.find('stem')
        pos_pos = param_name.find('pos_enc')
        if pos_stem >= 0:
            param_name = param_name[pos_stem:]
        elif pos_pos >= 0:
            param_name = param_name[pos_pos:]

        if node.module is not None:
            param_name = _normalize_ops_path(param_name)
            name = _module_primitive(node.module, param_name)
            assert name is not None, (param_name, type(node.module))
        else:
            op = _op_key(param_name)
            name = _BACKWARD_OP_PRIMITIVE.get(op, 'sum')  # 'sum' marks leftovers when reduce_graph=False
            n_glob_avg += int(name == 'glob_avg')
            if n_cells > 1 and param_name.startswith(('MaxPool', 'AvgPool')):
                param_name = 'cells.%d.%s' % (cell_ind, name)

        sz = None
        attrs = node.attrs
        if isinstance(attrs, dict):
            if 'size' in attrs:
                sz = tuple(attrs['size'])
            elif name.find('pool') >= 0:
                if 'kernel_size' in attrs:
                    ks = [int(a.strip('()').strip()) for a in attrs['kernel_size'].split(',')]
                    sz = (1, 1, *ks)
                else:
                    sz = (1, 1, 3, 3)
        elif node.module is not None:
            p = node.module.weight if param_name.find('weight') >= 0 else node.module.bias
            sz = tuple(p.shape)

        if sz is not None:
            if len(sz) == 3 and sz[0] == 1 and min(sz[1:]) > 1:
                # ViT-style [1, tokens, dim] -> 4d spatial layout for DeepNets consistency
                s = int(np.floor(sz[1] ** 0.5))
                if verbose:
                    print(f'WARNING: setting a 4d size (1, {sz[2]}, {s}, {s}) instead of 3d {tuple(sz)}')
                sz = (1, sz[2], s, s)
            elif len(sz) == 4 and node_ind == len(nodes) - 2 and max(sz[2:]) == 1:
                sz = sz[:2]

        param_shapes.append(sz)
        node_op[node_ind] = PRIMITIVE_INDEX[name]

        if node.module is not None or name.find('pool') >= 0:
            node_info[cell_ind].append(NodeParam(
                node_ind=node_ind,
                param_name=param_name if node.module is not None else name,
                op=name,
                sz=sz,
                is_last_weight=node_ind == len(nodes) - 2 and param_name.find('.weight') >= 0,
                is_last_bias=node_ind == len(nodes) - 1 and param_name.find('.bias') >= 0,
            ))

    if n_glob_avg != 1 and verbose:
        print(f'WARNING: n_glob_avg should be 1 in most architectures, but is {n_glob_avg}.')
    return node_op, node_info, param_shapes


def trace_torch_model(model,
                      ve_cutoff: int = 50,
                      reduce_graph: bool = True,
                      fix_weight_edges: bool = True,
                      fix_softmax_edges: bool = True,
                      verbose: bool = False) -> GraphDef:
    """Build a :class:`GraphDef` for an arbitrary PyTorch ``nn.Module``."""
    import copy as _copy

    input_sz = expected_input_size(model)
    n_cells = getattr(model, '_n_cells', 1)

    nodes, A = _autograd_walk(model, input_sz)

    if reduce_graph:
        nodes, A = _filter_graph(nodes, A)
    if fix_weight_edges:
        _fix_weight_edges(nodes, A)
    if fix_softmax_edges:
        _fix_softmax_edges(nodes, A)
    if int(A[np.diag_indices_from(A)].sum()) > 0 and verbose:
        print('WARNING: diagonal elements of the adjacency matrix should be zero')
    _fix_swin_edges(model, nodes, A)
    if reduce_graph:
        nodes, A = _filter_graph(nodes, A, patterns=['Add', 'Cat'])

    # add the input node, wiring it into weight nodes that have no incoming edges
    A = np.pad(A, ((0, 1), (0, 1)), mode='constant')
    nodes = list(nodes) + [_Node('input', None, None)]
    for ind in np.where(A.sum(0) == 0)[0]:
        if nodes[ind].param_name.find('weight') >= 0:
            A[-1, ind] = 1

    # topological sort; networkx's tie-breaking order is load-bearing (pretrained
    # checkpoints saw node sequences produced by nx.topological_sort)
    np.fill_diagonal(A, 0)
    try:
        import networkx as nx
        order = np.array(list(nx.topological_sort(nx.DiGraph(A))))
        nodes = [nodes[i] for i in order]
        A = A[order][:, order]
    except Exception as e:
        if verbose:
            print('WARNING: topological sort failed:', e)

    # model-specific post fixes
    cls_name = type(model).__name__
    if cls_name in ('VisionTransformer', 'Network', 'NetworkLight'):
        # insert an explicit sum node after positional encodings (reference graph.py:626-634)
        for i, node in enumerate(nodes):
            if node.module is not None and type(node.module).__name__ in ('PosEnc', 'Encoder'):
                nodes.insert(i + 1, _Node('AddBackward0', None, None))
                A = np.insert(A, i, 0, axis=0)
                A = np.insert(A, i, 0, axis=1)
                A[i, i + 1] = 1
    elif cls_name == 'SqueezeNet':
        assert nodes[-1].param_name.startswith('MeanBackward'), nodes[-1].param_name
        assert nodes[-3].param_name.startswith('classifier'), nodes[-3].param_name
        nodes.insert(len(nodes) - 3, _copy.copy(nodes[-1]))
        del nodes[-1]

    A = add_virtual_edges(A, cutoff=ve_cutoff)

    node_op, node_info, param_shapes = _construct_features(nodes, A, n_cells, verbose)

    return GraphDef(node_op=node_op, adj=A, node_info=node_info, param_shapes=param_shapes,
                    net=model)


def num_valid_nodes(model, input_sz=None) -> int:
    """Count learnable parameter tensors that receive gradients (reference
    Graph.num_valid_nodes, graph.py:354-390 — debug_level>=2 check that the
    graph covers every trainable tensor)."""
    import torch
    input_sz = input_sz or expected_input_size(model)
    device = next(model.parameters()).device
    with torch.enable_grad():
        out = model((torch.rand(1, *input_sz, device=device) - 0.5) / 2)
        if isinstance(out, tuple):
            out = out[0]
        loss = out.mean()
        if torch.isnan(loss):
            return -1
        loss.backward()
        valid = 0
        for _, p in model.named_parameters():
            if p.requires_grad and p.grad is not None and p.grad.abs().sum() > 1e-20:
                valid += 1
        model.zero_grad(set_to_none=True)
    return valid
