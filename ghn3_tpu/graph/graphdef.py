"""Graph IR: static-shape, numpy-backed computational-graph descriptions.

This is the TPU-native replacement for the reference's `Graph`/`GraphBatch`
(/root/reference/ghn3/graph.py:38-353). Differences by design:

* Graphs are plain numpy payloads produced by host-side frontends (torch tracer,
  DeepNets-1M decoder, native specs). No framework objects, trivially picklable.
* Batching pads node counts to a small set of bucket sizes so that XLA compiles
  O(#buckets) programs instead of one per distinct node count.
* Decode-time node gathers use per-graph slab offsets (``b * N_pad + i``). The
  reference uses cumulative n_nodes offsets into a dense-flattened array
  (nn.py:259-275 + graph.py:90) which makes batched prediction differ from
  per-model prediction whenever graphs in a batch have unequal sizes; here
  batched == individual by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np



@dataclasses.dataclass
class NodeParam:
    """Per-node parameter metadata (reference `node_info` rows, graph.py:892-899)."""
    node_ind: int                      # node index within the graph
    param_name: str                    # e.g. 'layer1.0.conv1.weight'
    op: str                            # primitive name, e.g. 'conv'
    sz: Optional[Tuple[int, ...]]      # tensor shape hint (None for e.g. pools)
    is_last_weight: bool               # final classification weight
    is_last_bias: bool                 # final classification bias


@dataclasses.dataclass
class GraphDef:
    """One computational graph, ready for batching."""
    node_op: np.ndarray                   # [N] int32 primitive indices
    adj: np.ndarray                       # [N, N] int32; 0 none, d>=1 shortest-path distance
    node_info: List[List[NodeParam]]      # per cell
    param_shapes: List[Optional[Tuple[int, ...]]]  # [N]
    net_args: Optional[dict] = None       # constructor args of the target net (DeepNets-1M)
    net_idx: Optional[int] = None
    net: Any = None                       # attached target: TargetSpec / torch module / callable

    @property
    def n_nodes(self) -> int:
        return int(self.node_op.shape[0])

    def __post_init__(self):
        self.node_op = np.asarray(self.node_op, dtype=np.int32).reshape(-1)
        self.adj = np.asarray(self.adj, dtype=np.int32)
        assert self.adj.shape == (self.n_nodes, self.n_nodes), (self.adj.shape, self.n_nodes)

    # ------------------------------------------------------------------
    # statistics / visualization (reference Graph.properties / visualize,
    # graph.py:960-1102)
    # ------------------------------------------------------------------
    def one_hop_adj(self) -> np.ndarray:
        """Binary adjacency without virtual edges."""
        return (self.adj == 1).astype(np.int32)

    def properties(self, undirected: bool = True, key=('avg_degree', 'avg_path')) -> dict:
        import networkx as nx
        g = nx.DiGraph(self.one_hop_adj())
        if undirected:
            g = g.to_undirected()
        props = {}
        for prop in key:
            if prop == 'avg_degree':
                degrees = dict(g.degree())
                props[prop] = sum(degrees.values()) / max(1, self.n_nodes)
            elif prop == 'avg_path':
                props[prop] = nx.average_shortest_path_length(g)
            else:
                raise NotImplementedError(prop)
        return props

    def visualize(self, figname=None, figsize=(10, 10), with_labels=False, font_size=6):
        """Draw the graph colored by primitive (matplotlib + networkx)."""
        import matplotlib
        if figname is not None:
            matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from matplotlib import cm
        import networkx as nx
        from .primitives import NUM_PRIMITIVES, PRIMITIVES

        g = nx.DiGraph(self.one_hop_adj())
        colors = [cm.jet(int(round(255 * op / NUM_PRIMITIVES))) for op in self.node_op]
        labels = {i: PRIMITIVES[op] for i, op in enumerate(self.node_op)}
        fig = plt.figure(figsize=figsize)
        try:
            pos = nx.nx_pydot.graphviz_layout(g)
        except Exception:
            pos = nx.spring_layout(g, seed=0)
        nx.draw_networkx(g, pos, node_color=colors, with_labels=with_labels,
                         labels=labels if with_labels else None, font_size=font_size,
                         node_size=50, arrowsize=8)
        plt.axis('off')
        if figname is not None:
            plt.savefig(figname, dpi=fig.dpi)
            plt.close(fig)
        else:
            plt.show()


# Node-count buckets: geometric-ish steps, multiples of 8 (fp32 sublane) with larger
# sizes on 128-lane multiples. Attention cost is O(N^2), so ~1.25-1.5x steps cap the
# padding waste at ~2x worst case while keeping the compiled-program count small.
DEFAULT_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 640, 768, 1024,
                   1280, 1536, 2048, 2560, 3072, 4096)


def bucket_size(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / 512) * 512)


@dataclasses.dataclass
class GraphBatch:
    """A padded batch of graphs (device-feedable numpy arrays + host metadata)."""
    node_op: np.ndarray     # [B, N_pad] int32 (padded with 0)
    adj: np.ndarray         # [B, N_pad, N_pad] int32
    mask: np.ndarray        # [B, N_pad] bool
    n_nodes: np.ndarray     # [B] int32 (actual counts)
    graphs: List[GraphDef]

    @property
    def n_pad(self) -> int:
        return int(self.node_op.shape[1])

    def __len__(self) -> int:
        return len(self.graphs)

    def __iter__(self):
        return iter(self.graphs)

    def __getitem__(self, i) -> GraphDef:
        return self.graphs[i]

    @property
    def node_info(self) -> List[List[List[NodeParam]]]:
        return [g.node_info for g in self.graphs]

    @property
    def nets(self) -> List[Any]:
        return [g.net for g in self.graphs]

    def slab_offset(self, b: int) -> int:
        """Flat row offset of graph ``b``'s node 0 in the [B*N_pad, hid] embedding array."""
        return b * self.n_pad

    @staticmethod
    def from_graphs(graphs: Sequence[GraphDef],
                    buckets: Sequence[int] = DEFAULT_BUCKETS,
                    pad_to: Optional[int] = None) -> 'GraphBatch':
        graphs = list(graphs)
        assert len(graphs) > 0
        n_max = max(g.n_nodes for g in graphs)
        n_pad = pad_to if pad_to is not None else bucket_size(n_max, buckets)
        assert n_pad >= n_max, (n_pad, n_max)
        b = len(graphs)
        node_op = np.zeros((b, n_pad), dtype=np.int32)
        adj = np.zeros((b, n_pad, n_pad), dtype=np.int32)
        mask = np.zeros((b, n_pad), dtype=bool)
        n_nodes = np.zeros((b,), dtype=np.int32)
        for i, g in enumerate(graphs):
            n = g.n_nodes
            node_op[i, :n] = g.node_op
            adj[i, :n, :n] = g.adj
            mask[i, :n] = True
            n_nodes[i] = n
        return GraphBatch(node_op=node_op, adj=adj, mask=mask, n_nodes=n_nodes, graphs=graphs)


def balanced_partition(n_nodes: Sequence[int], num_shards: int, per_shard: int) -> List[List[int]]:
    """Greedy heap partition of graphs across shards by node count (replacement for
    the reference's `GraphBatch._sort_by_nodes` device scatter, graph.py:187-241):
    used to balance meta-batch shards under data parallelism."""
    import heapq
    order = np.argsort(np.asarray(n_nodes))[::-1]
    heap = [(0, s) for s in range(num_shards)]
    heapq.heapify(heap)
    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for idx in order:
        pending = []
        while True:
            load, s = heapq.heappop(heap)
            if len(shards[s]) < per_shard:
                break
            pending.append((load, s))
        for item in pending:
            heapq.heappush(heap, item)
        shards[s].append(int(idx))
        heapq.heappush(heap, (load + int(n_nodes[idx]), s))
    return shards
