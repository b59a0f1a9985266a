"""Native-spec target nets: functional nets that *construct* their own GraphDef.

The reference can only obtain a computational graph by running torch autograd
tracing (graph.py:392). Native specs skip tracing entirely: the architecture
description emits nodes/edges directly — microseconds instead of seconds of
host work, and no torch dependency on the training path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graphdef import GraphDef, NodeParam
from ..graph.primitives import PRIMITIVE_INDEX
from ..graph.shortest_paths import add_virtual_edges
from .functional import BatchNorm2d, Conv2d, FModule, Linear


class GraphSpec:
    """Incremental builder of a GraphDef: chain/merge nodes, then finalize."""

    def __init__(self):
        self.names: List[str] = []
        self.ops: List[str] = []
        self.shapes: List[Optional[Tuple[int, ...]]] = []
        self.edges: List[Tuple[int, int]] = []
        self.add_node('input', 'input', None)

    def add_node(self, name: str, op: str, sz, preds: Tuple[int, ...] = ()) -> int:
        idx = len(self.names)
        self.names.append(name)
        self.ops.append(op)
        self.shapes.append(None if sz is None else tuple(sz))
        for p in preds:
            self.edges.append((p, idx))
        return idx

    def finalize(self, n_cells: int = 1, ve_cutoff: int = 50) -> GraphDef:
        n = len(self.names)
        adj = np.zeros((n, n), dtype=np.int32)
        for a, b in self.edges:
            adj[a, b] = 1
        adj = add_virtual_edges(adj, cutoff=ve_cutoff)
        node_op = np.array([PRIMITIVE_INDEX[o] for o in self.ops], dtype=np.int32)
        node_info = [[] for _ in range(n_cells)]
        param_ops = ('conv', 'sep_conv', 'dil_conv', 'bn', 'ln', 'bias', 'pos_enc')
        for i, (name, op, sz) in enumerate(zip(self.names, self.ops, self.shapes)):
            if op in param_ops or op.find('pool') >= 0:
                node_info[0].append(NodeParam(
                    node_ind=i, param_name=name if op in param_ops else op, op=op, sz=sz,
                    is_last_weight=i == n - 2 and name.endswith('.weight'),
                    is_last_bias=i == n - 1 and name.endswith('.bias')))
        return GraphDef(node_op=node_op, adj=adj, node_info=node_info,
                        param_shapes=list(self.shapes))


class ConvNet(FModule):
    """Plain CNN: [conv-bn-relu] x depth -> global avg -> fc. Native graph spec."""

    def __init__(self, channels: Tuple[int, ...] = (16, 32), num_classes: int = 10,
                 in_channels: int = 3, ks: int = 3, input_sz: int = 32):
        super().__init__()
        self.expected_input_sz = input_sz
        self.num_classes = num_classes
        self._n_cells = 1
        cin = in_channels
        self.convs: List[Conv2d] = []
        self.bns: List[BatchNorm2d] = []
        for i, c in enumerate(channels):
            conv = Conv2d(cin, c, ks, stride=2 if i > 0 else 1, padding=ks // 2, bias=False)
            bn = BatchNorm2d(c)
            self.add(f'conv{i}', conv)
            self.add(f'bn{i}', bn)
            self.convs.append(conv)
            self.bns.append(bn)
            cin = c
        self.fc = Linear(cin, num_classes)
        self.predicted = {}

    def __call__(self, P, x, prefix: str = '', training: bool = False):
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            x = conv(P, x, f'{prefix}conv{i}.', training)
            x = bn(P, x, f'{prefix}bn{i}.', training)
            x = jax.nn.relu(x)
        x = x.mean(axis=(2, 3))
        return self.fc(P, x, f'{prefix}fc.', training)

    def graph_def(self, ve_cutoff: int = 50) -> GraphDef:
        spec = GraphSpec()
        prev = 0
        for name, shape, is_w in self.named_params():
            if name.endswith('bias') and name.startswith('fc'):
                continue  # added after glob_avg
            if name.startswith('conv'):
                prev = spec.add_node(name, 'conv', shape, (prev,))
            elif name.startswith('bn') and name.endswith('.weight'):
                prev = spec.add_node(name, 'bn', shape, (prev,))
        prev = spec.add_node('glob_avg', 'glob_avg', None, (prev,))
        prev = spec.add_node('fc.weight', 'conv', dict(self.param_shapes())['fc.weight'], (prev,))
        spec.add_node('fc.bias', 'bias', dict(self.param_shapes())['fc.bias'], (prev,))
        g = spec.finalize(ve_cutoff=ve_cutoff)
        g.net = self
        return g

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

    def init_params(self, rng) -> dict:
        """He-style random init (for baseline/classifier training without a GHN)."""
        params = {}
        keys = jax.random.split(rng, len(list(self.named_params())))
        for k, (name, shape, is_w) in zip(keys, self.named_params()):
            if name.endswith('.bias') or not is_w or len(shape) == 1:
                params[name] = jnp.zeros(shape) if not name.startswith('bn') else jnp.ones(shape)
                if name.endswith('.bias'):
                    params[name] = jnp.zeros(shape)
            else:
                fan_in = int(np.prod(shape[1:]))
                params[name] = jax.random.normal(k, shape) * np.sqrt(2.0 / fan_in)
        return params
