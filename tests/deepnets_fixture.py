"""Builds a tiny DeepNets-1M-format dataset fixture from reference-traced graphs.

Uses the reference Graph builder (via the test shims) on reference-style torch
Networks, then inverts the loader's decode transformations to produce stored
(adj, nodes) records + metadata in our documented storage format
(ghn3_tpu/data/deepnets1m.py). Exercises: name-fix inversion round-trips,
extended primitive names with kernel suffixes, pools, stems, msa/cse ops.
"""
import json
import os
import re

import numpy as np

from conftest import enable_reference_import

GENOTYPES = [
    # (genotype dict, net args)
    ({'normal': [['conv_3x3', 0], ['conv_5x5', 1]], 'normal_concat': [2],
      'reduce': [['conv_3x3', 0], ['skip_connect', 1]], 'reduce_concat': [2]},
     dict(n_cells=3, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=1,
          fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)),
    ({'normal': [['sep_conv_3x3', 0], ['max_pool_3x3', 1]], 'normal_concat': [2],
      'reduce': [['dil_conv_3x3', 0], ['avg_pool_3x3', 1]], 'reduce_concat': [2]},
     dict(n_cells=3, C=8, glob_avg=True, preproc=True, C_mult=2, fc_layers=1,
          fc_dim=0, stem_type=1, stem_pool=False, norm='bn', ks=3)),
    ({'normal': [['msa', 0], ['skip_connect', 1]], 'normal_concat': [2],
      'reduce': [['msa', 0], ['skip_connect', 1]], 'reduce_concat': [2]},
     dict(n_cells=2, C=8, glob_avg=True, preproc=True, C_mult=1, fc_layers=1,
          fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)),
]


def _invert_name(param_name: str, n_cells: int):
    """Invert the decode-time name fixes (data/deepnets1m.py decode_record)."""
    name = param_name
    m = re.match(r'cells\.(\d+)\.(.*)$', name)
    if m:
        cell_ind = int(m.group(1))
        name = m.group(2)
    elif name.startswith(('classifier', 'auxiliary')):
        cell_ind = n_cells - 1
    elif name.startswith(('stem', 'pos_enc')):
        cell_ind = 0
    elif name == 'input':
        return 0, ''
    else:
        cell_ind = 0
    # remove the inserted '.op' in '_ops.<i>.op.<int>'
    name = re.sub(r'(_ops\.\d+)\.op\.(\d)', r'\1.\2', name)
    # store attention paths without the 'attn.' component
    name = name.replace('attn.to_qkv', 'to_qkv').replace('attn.to_out', 'to_out')
    return cell_ind, name


def _ext_primitive(base: str, sz):
    """Reconstruct an extended (kernel-suffixed) primitive name."""
    if base in ('conv', 'sep_conv', 'dil_conv') and sz is not None and len(sz) == 4 \
            and sz[2] == sz[3] and sz[2] in (3, 5, 7):
        return f'{base}_{sz[2]}x{sz[2]}'
    if base in ('max_pool', 'avg_pool'):
        return f'{base}_3x3'
    return base


def build_fixture(nets_dir: str, n_copies: int = 2):
    """Writes deepnets1m_train.hdf5 / deepnets1m_eval.hdf5 + deepnets1m_meta.json."""
    enable_reference_import()
    import h5py
    from ghn3.graph import Graph
    from ghn3.ops import Network as RefNetwork
    from ppuda.deepnets1m.genotypes import from_dict, PRIMITIVES_DEEPNETS1M

    prim_ext = {}
    op_names = {}

    def intern(table, value):
        for k, v in table.items():
            if v == value:
                return int(k)
        k = len(table)
        table[str(k)] = value
        return k

    records = []
    nets_meta = []
    for geno_dict, args in GENOTYPES:
        genotype = from_dict(geno_dict)
        net = RefNetwork(genotype=genotype, num_classes=10, is_imagenet_input=False,
                         imagenet_stride=4, auxiliary=False, **args)
        g = Graph(net, ve_cutoff=50)
        n = g.n_nodes
        nodes = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            base = PRIMITIVES_DEEPNETS1M[int(g.node_feat[i, 0])]
            param_name = g._nodes[i]['param_name']
            if param_name.find('Backward') >= 0 or param_name in ('input',):
                # op nodes: stored name resolves to pool/aggregation primitives
                if base.find('pool') >= 0:
                    stored = base  # decode re-prefixes with cells.<i>.
                else:
                    stored = '' if base == 'input' else base
                cell_ind = 0
                m = re.match(r'cells\.(\d+)\.', param_name)
                if m:
                    cell_ind = int(m.group(1))
            else:
                cell_ind, stored = _invert_name(param_name, args['n_cells'])
            sz = g._param_shapes[i]
            if i == n - 1 and base == 'bias':
                ext = 'fc-b'
            else:
                ext = _ext_primitive(base, None if sz is None else tuple(sz))
            nodes[i] = (intern(prim_ext, ext), cell_ind, intern(op_names, stored))
        adj = np.asarray(g._Adj, dtype=np.int16)
        records.append((adj, nodes))
        nets_meta.append({
            'genotype': geno_dict,
            'n_cells': args['n_cells'],
            'num_nodes': int(n),   # published ppuda metadata key
            'num_params': {'cifar10': sum(p.numel() for p in net.parameters()) ,
                           'imagenet': sum(p.numel() for p in net.parameters())},
            'glob_avg': args['glob_avg'], 'preproc': args['preproc'],
            'C_mult': args['C_mult'], 'fc_layers': args['fc_layers'],
            'fc_dim': args['fc_dim'], 'stem_type': args['stem_type'],
            'stem_pool': args['stem_pool'], 'norm': args['norm'], 'ks': args['ks'],
            'C': args['C'],
        })

    os.makedirs(nets_dir, exist_ok=True)
    for split, fname in (('train', 'deepnets1m_train.hdf5'), ('val', 'deepnets1m_eval.hdf5')):
        with h5py.File(os.path.join(nets_dir, fname), 'w') as f:
            grp = f.create_group(split)
            for i in range(len(records) * n_copies):
                adj, nodes = records[i % len(records)]
                sub = grp.create_group(str(i))
                sub.create_dataset('adj', data=adj)
                sub.create_dataset('nodes', data=nodes)

    meta = {'meta': {'primitives_ext': prim_ext, 'op_names_net': op_names}}
    for split in ('train', 'val'):
        meta[split] = {'nets': [dict(nets_meta[i % len(nets_meta)])
                                for i in range(len(nets_meta) * n_copies)]}
    with open(os.path.join(nets_dir, 'deepnets1m_meta.json'), 'w') as f:
        json.dump(meta, f)
    return nets_dir
