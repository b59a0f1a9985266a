"""DeepNets-1M dataset pipeline: hdf5-backed architecture sampler for GHN
meta-training and eval splits.

Replaces the reference DeepNets1MDDP loader (/root/reference/ghn3/deepnets1m.py)
AND the external ppuda DeepNets1M base it inherits (SURVEY §2.9): reads stored
(adjacency, nodes) records, applies the same decode fixes (stem rewiring,
multi-input pruning, virtual-edge recompute), randomizes widths ("wider_nets"),
and attaches a functional JAX Network skeleton per graph.

Published ppuda file layout (pinned by the reference's own h5 access at
deepnets1m.py:90-91,144 and metadata access at deepnets1m.py:95-133; the
metadata JSON nesting is reconstructed from ppuda call sites — zero-egress
environment, so field aliases are accepted liberally):

  deepnets1m_train.hdf5 / deepnets1m_search.hdf5 / deepnets1m_eval.hdf5:
      h5[<split>][str(h5_idx)]['adj' | 'nodes']
      adj:   [N, N] small-int — 1-hop adjacency with virtual-edge shortest-path
             distances baked in (values > 1)
      nodes: [N, 3] int — (primitive_ext_id, cell_index, op_name_id)
      the eval file holds one group per eval split (val/test/wide/deep/dense/bnfree)
  deepnets1m_meta.json:
      {<split>: {"nets": [net-arg records...],
                 ["meta": {...}]},                 # per-split nesting, or
       "meta": {"primitives_ext": {"<id>": name},  # top-level nesting
                "op_names_net":  {"<id>": name}}}
      net-arg record keys: genotype (dict), n_cells, norm, ks, preproc, glob_avg,
      stem_pool, C_mult, fc_layers, C, fc_dim, stem_type,
      num_params {"cifar10": int, "imagenet": int}, num_nodes (alias n_nodes).

Width-randomization pools follow ppuda: num_ch = 32..128 step 16,
fc_dim = 64..512 step 64 (the reference samples the first 4 — "64-256" — in the
restricted branch, deepnets1m.py:121).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..graph.genotypes import from_dict
from ..graph.graphdef import GraphDef, NodeParam
from ..graph.primitives import PRIMITIVE_INDEX_4
from ..graph.shortest_paths import add_virtual_edges

MAX_NODES_BATCH = 2200  # reference node-budget constant (ppuda loader surface)

SPLITS = ('train', 'search', 'val', 'test', 'wide', 'deep', 'dense', 'bnfree',
          'predefined')


def _dict_to_list(d: Dict) -> List[Optional[str]]:
    out: List[Optional[str]] = [None] * (1 + max(int(k) for k in d))
    for k, v in d.items():
        out[int(k)] = v
    return out


def _find_vocab(meta: dict, split: str, key: str) -> Dict:
    """Locate a vocabulary table across the known metadata nestings."""
    for container in (meta.get('meta', {}), meta.get(split, {}).get('meta', {}),
                      meta):
        if key in container:
            return container[key]
    raise KeyError(f'{key} not found in deepnets1m_meta.json '
                   f'(looked in top-level "meta", "{split}.meta", root)')


class DeepNets1M:
    """Dataset of computational graphs + target-net skeletons."""

    def __init__(self, split: str = 'train', nets_dir: str = './data',
                 virtual_edges: int = 50, num_nets: Optional[int] = None,
                 large_images: bool = False, wider_nets: bool = True,
                 seed: int = 0, debug: bool = False, attach_net: bool = True,
                 num_ch_pool: Optional[Sequence[int]] = None,
                 fc_dim_pool: Optional[Sequence[int]] = None):
        assert split in SPLITS, (split, SPLITS)
        # attach_net=False skips building the Network skeleton per item — the
        # genotype-as-data executor needs only net_args (nets/interpreter.py)
        self.attach_net = attach_net
        self.split = split
        self.is_train = split in ('train', 'search')
        self.virtual_edges = virtual_edges
        self.large_images = large_images
        self.wider_nets = wider_nets
        self.debug = debug
        self.rng = np.random.default_rng(seed)

        h5_name = 'deepnets1m_%s.hdf5' % (split if split in ('train', 'search') else 'eval')
        self.h5_file = os.path.join(nets_dir, h5_name)
        meta_path = os.path.join(nets_dir, 'deepnets1m_meta.json')
        with open(meta_path) as f:
            meta = json.load(f)
        self.nets: List[dict] = meta[split]['nets']
        # h5 records are addressed by position in the full metadata list; a
        # num_nets subset keeps the original h5 indices (reference
        # deepnets1m.py:96: `idx = self.h5_idx[idx] if self.h5_idx ...`)
        self.h5_idx: Optional[List[int]] = None
        if num_nets is not None and num_nets < len(self.nets):
            self.nets = self.nets[:num_nets]
            self.h5_idx = list(range(num_nets))
        self.primitives_ext = _dict_to_list(_find_vocab(meta, split, 'primitives_ext'))
        self.op_names_net = _dict_to_list(_find_vocab(meta, split, 'op_names_net'))
        self.h5_data = None  # opened lazily per worker/process

        # per-sample width/fc randomization pools (ppuda loader surface; the
        # restricted branches sample the first 2-5 entries, deepnets1m.py:113-124).
        # num_ch_pool/fc_dim_pool override the defaults to bound interpreter
        # bucket cardinality (tools/bucket_stats.py measures the trade-off).
        self.num_ch = (np.asarray(sorted(num_ch_pool), dtype=np.int64)
                       if num_ch_pool is not None else np.arange(32, 129, 16))
        self.fc_dim = (np.asarray(sorted(fc_dim_pool), dtype=np.int64)
                       if fc_dim_pool is not None else np.arange(64, 513, 64))

        self.node_counts = np.array([
            args.get('num_nodes', args.get('n_nodes', 64)) for args in self.nets])

    def __len__(self) -> int:
        return len(self.nets)

    # ------------------------------------------------------------------
    def _rand_choice(self, values: np.ndarray, n: Optional[int] = None):
        values = values[:len(values) if n is None else n]
        return int(self.rng.choice(values))

    def _sample_args(self, args: dict, genotype) -> dict:
        """Randomized widening of the sampled architecture (reference
        deepnets1m.py:99-133): channel/fc-dim/stride sampling by param budget."""
        args = dict(args)
        args['imagenet_stride'] = 4
        if not self.is_train:
            return args

        is_conv_dense = any(n[0] in ('conv_5x5', 'conv_7x7')
                            for n in genotype.normal + genotype.reduce)
        n_cells = args['n_cells']
        num_params = args['num_params']['imagenet' if self.large_images and
                                        not self.wider_nets else 'cifar10'] / 1e6

        if (self.wider_nets and self.large_images and args['glob_avg']
                and args['stem_type'] == 0 and args['stem_pool']
                and not (num_params > 0.2 or n_cells > 8 or is_conv_dense)):
            args['imagenet_stride'] = int(self.rng.choice([2, 4]))

        fc = self._rand_choice(self.fc_dim, 4)
        if num_params > (2.0 if self.wider_nets else 0.8) or not args['glob_avg'] \
                or is_conv_dense or n_cells > (14 if self.wider_nets else 12):
            c = int(self.num_ch.min())
        elif num_params > 0.4 or n_cells > 10:
            c = self._rand_choice(self.num_ch, 4 if self.wider_nets else 2)
        elif num_params > 0.2 or n_cells > 8:
            c = self._rand_choice(self.num_ch, 5 if self.wider_nets else 3)
        else:
            c = self._rand_choice(self.num_ch)
            if c <= 64:
                fc = self._rand_choice(self.fc_dim)
        args['C'] = c
        args['fc_dim'] = fc
        return args

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> GraphDef:
        if self.h5_data is None:
            import h5py
            self.h5_data = h5py.File(self.h5_file, mode='r')

        stored = self.nets[idx]
        genotype = from_dict(stored['genotype'])
        args = self._sample_args(stored, genotype)

        net_args = {'genotype': genotype}
        for key in ('norm', 'ks', 'preproc', 'glob_avg', 'stem_pool', 'C_mult',
                    'n_cells', 'fc_layers', 'C', 'fc_dim', 'stem_type', 'imagenet_stride'):
            if key == 'C' and self.split == 'wide':
                net_args[key] = args[key] * (2 if self.large_images else 4)
            else:
                net_args[key] = args[key]

        h5_key = self.h5_idx[idx] if self.h5_idx is not None else idx
        rec = self.h5_data[self.split][str(h5_key)]
        graph = self.decode_record(np.asarray(rec['adj'][()]),
                                   np.asarray(rec['nodes'][()]), net_args)
        graph.net_idx = idx

        if self.is_train and not self.debug and self.attach_net:
            from ..nets.darts import Network
            graph.net = Network(is_imagenet_input=self.large_images,
                                num_classes=1000 if self.large_images else 10,
                                **net_args)
        return graph

    def interpreter_vocab(self):
        """Op vocabulary of this dataset for the genotype-as-data executor,
        derived from the stored genotypes (node-level primitives_ext misses
        no-parameter genotype ops like skip_connect/none)."""
        from ..nets.interpreter import vocab_from_primitives
        names = {'none', 'skip_connect'}
        for args in self.nets:
            geno = args['genotype']
            pairs = (geno['normal'] + geno['reduce']) if isinstance(geno, dict) \
                else (list(geno.normal) + list(geno.reduce))
            names.update(op for op, _src in pairs)
        return vocab_from_primitives(sorted(names))

    # ------------------------------------------------------------------
    def decode_record(self, adj: np.ndarray, nodes: np.ndarray, net_args: dict) -> GraphDef:
        """Stored (adj, nodes) -> GraphDef, applying the decode bug-fixes of the
        reference `_init_graph` (deepnets1m.py:155-269)."""
        genotype = net_args['genotype']
        n_cells = net_args['n_cells']
        is_vit = any(n[0] == 'msa' for n in genotype.normal + genotype.reduce)
        n = adj.shape[0]
        assert n == len(nodes), (n, len(nodes))
        adj = adj.astype(np.int64)
        recompute_ve = False

        # stem0/stem1 rewiring fix for imagenet-style stems
        if net_args['stem_type'] == 1 and not is_vit:
            stem0, stem1 = (4, 6) if net_args['norm'] is not None else (2, 3)
            if self.debug:
                expect0 = 'stem0.4.weight' if net_args['norm'] is not None else 'stem0.3'
                expect1 = 'stem1.2.weight' if net_args['norm'] is not None else 'stem1.1'
                assert self.op_names_net[nodes[stem0][2]] == expect0
                assert self.op_names_net[nodes[stem1][2]] == expect1
            stem0_out = np.nonzero(adj[stem0, :] == 1)[0]
            stem1_out = np.nonzero(adj[stem1, :] == 1)[0]
            if len(stem1_out) == 1 and len(stem0_out) > 1:
                if stem0_out[-1] - stem0_out[-2] > 1:
                    adj[stem0, stem0_out[-1]] = 0
                    adj[stem1, stem0_out[-1]] = 1
                    recompute_ve = True

        # nodes with several 1-hop inputs must be aggregation ops
        multi_in = np.nonzero((adj == 1).sum(0) > 1)[0]
        for i in multi_in:
            name = self.primitives_ext[nodes[i][0]]
            if name not in ('concat', 'sum', 'cse'):
                incoming = np.nonzero(adj[:, i] == 1)[0]
                adj[incoming[1:], i] = 0
                recompute_ve = True

        if recompute_ve and self.virtual_edges > 1:
            adj[adj > 1] = 0
            adj = add_virtual_edges(adj, cutoff=self.virtual_edges)

        node_op = np.zeros(n, dtype=np.int32)
        node_info: List[List[NodeParam]] = [[] for _ in range(n_cells)]
        param_shapes: List[Optional[tuple]] = []
        for node_ind, node in enumerate(nodes):
            name = self.primitives_ext[node[0]]
            name_op_net = self.op_names_net[node[2]]
            cell_ind = int(node[1])
            sz = None

            if not name_op_net.startswith('classifier'):
                if name_op_net.find('attn.') < 0:
                    name_op_net = name_op_net.replace('to_qkv', 'attn.to_qkv') \
                                             .replace('to_out', 'attn.to_out')
                if len(name_op_net) == 0:
                    name_op_net = 'input'
                elif name_op_net.endswith('to_out.0.'):
                    name_op_net += 'weight'
                else:
                    parts = name_op_net.split('.')
                    for i, s in enumerate(parts):
                        if s == '_ops' and i + 2 < len(parts) and parts[i + 2] != 'op':
                            try:
                                int(parts[i + 2])
                            except ValueError:
                                continue
                            parts.insert(i + 2, 'op')
                            name_op_net = '.'.join(parts)
                            break
                name_op_net = 'cells.%d.%s' % (cell_ind, name_op_net)

                stem_p = name_op_net.find('stem')
                pos_enc_p = name_op_net.find('pos_enc')
                if stem_p >= 0:
                    name_op_net = name_op_net[stem_p:]
                elif pos_enc_p >= 0:
                    name_op_net = name_op_net[pos_enc_p:]
                elif name.find('pool') >= 0:
                    sz = (1, 1, 3, 3)  # all DeepNets-1M pooling layers are 3x3

            if name.startswith('conv_'):
                if name == 'conv_1x1':
                    sz = (16, 3, 1, 1)
                name = 'conv'
            elif name.find('conv_') > 0 or name.find('pool_') > 0:
                name = name[:len(name) - 4]
            elif name == 'fc-b':
                name = 'bias'

            param_shapes.append(sz)
            node_op[node_ind] = PRIMITIVE_INDEX_4[name[:4]]

            if name.find('conv') >= 0 or name.find('pool') >= 0 or \
                    name in ('bias', 'bn', 'ln', 'pos_enc'):
                node_info[cell_ind].append(NodeParam(
                    node_ind=node_ind, param_name=name_op_net, op=name, sz=sz,
                    is_last_weight=node_ind == len(nodes) - 2,
                    is_last_bias=node_ind == len(nodes) - 1))

        adj = np.where(adj > self.virtual_edges, 0, adj).astype(np.int32)
        return GraphDef(node_op=node_op, adj=adj, node_info=node_info,
                        param_shapes=param_shapes, net_args=net_args)


class NodeBudgetSampler:
    """Infinite shuffled meta-batch sampler with a node-count budget
    (reference NetBatchSamplerDDP, deepnets1m.py:282-319). Under data parallelism
    each process samples its own shard deterministically from (seed, epoch)."""

    def __init__(self, dataset: DeepNets1M, meta_batch_size: int = 1,
                 shard: int = 0, num_shards: int = 1, seed: int = 0):
        self.dataset = dataset
        self.meta_batch_size = meta_batch_size
        self.shard = shard
        self.num_shards = num_shards
        self.seed = seed
        self.max_nodes_batch = (int(MAX_NODES_BATCH / 8 * max(8, meta_batch_size))
                                if dataset.is_train and meta_batch_size > 1 else None)
        self.epoch = 0

    def check_batch(self, batch: Sequence[int]) -> bool:
        if self.max_nodes_batch is None:
            return True
        return int(self.dataset.node_counts[list(batch)].sum()) <= self.max_nodes_batch

    def __iter__(self) -> Iterator[List[int]]:
        while True:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(len(self.dataset))
            order = order[self.shard::self.num_shards]
            batch: List[int] = []
            for idx in order:
                batch.append(int(idx))
                if len(batch) == self.meta_batch_size:
                    if self.check_batch(batch):
                        yield batch
                    batch = []
            if batch and self.check_batch(batch):
                yield batch
            self.epoch += 1
