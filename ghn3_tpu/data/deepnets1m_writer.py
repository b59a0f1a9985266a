"""DeepNets-1M dataset WRITER: generate architecture files in the published
ppuda hdf5/metadata layout that `data/deepnets1m.py` (and the reference loader,
/root/reference/ghn3/deepnets1m.py:90-91) consume.

The reference ecosystem ships the dataset as downloads; in download-free
environments this module makes GHN meta-training on the real file format fully
self-contained: sample genotypes + net args, build graphs with the constructive
builder (`nets/darts_graph.py` — no torch, ~5 ms per net), invert the loader's
decode transformations into stored (adj, nodes) records, and write
``deepnets1m_<split>.hdf5`` + ``deepnets1m_meta.json``.

Round-trip correctness is tested: writer output loaded through ``DeepNets1M``
decodes to byte-identical graphs (tests/test_deepnets.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.genotypes import Genotype, random_genotype
from ..graph.primitives import PRIMITIVES
from ..nets.darts_graph import build_genotype_graph

__all__ = ['graph_record', 'sample_net_args', 'write_dataset']


def _stored_name(param_name: str, op: str, n_cells: int) -> Tuple[int, str]:
    """Invert the loader's decode-time name fixes (deepnets1m.py decode_record):
    strip the ``cells.<i>.`` prefix (recording the cell), remove the inserted
    ``.op.`` path component, store attention paths without ``attn.``."""
    name = param_name
    m = re.match(r'cells\.(\d+)\.(.*)$', name)
    if m:
        cell_ind = int(m.group(1))
        name = m.group(2)
    elif name.startswith(('classifier', 'auxiliary')):
        cell_ind = n_cells - 1
    elif name.startswith(('stem', 'pos_enc')):
        cell_ind = 0
    elif name == '' or op == 'input':
        return 0, ''
    else:
        cell_ind = 0
    name = re.sub(r'(_ops\.\d+)\.op\.(\d)', r'\1.\2', name)
    name = name.replace('attn.to_qkv', 'to_qkv').replace('attn.to_out', 'to_out')
    return cell_ind, name


def _ext_primitive(base: str, sz: Optional[Tuple[int, ...]]) -> str:
    """Extended (kernel-suffixed) primitive name as stored by ppuda."""
    if base in ('conv', 'sep_conv', 'dil_conv') and sz is not None and len(sz) == 4 \
            and sz[2] == sz[3] and sz[2] in (3, 5, 7):
        return f'{base}_{sz[2]}x{sz[2]}'
    return base


def graph_record(g, n_cells: int) -> Tuple[np.ndarray, np.ndarray, List[str], List[str]]:
    """One stored record from a constructive GraphDef (requires
    ``g.builder_meta``). Returns (adj int16, nodes [N,3] with NAMES in place of
    ids, ext names, op names) — callers intern names into the shared vocab."""
    meta = g.builder_meta
    names, ops, cells = meta['names'], meta['ops'], meta['cells']
    n = g.n_nodes
    nodes_ext: List[str] = []
    nodes_cell: List[int] = []
    nodes_name: List[str] = []
    for i in range(n):
        base = PRIMITIVES[int(g.node_op[i])]
        sz = g.param_shapes[i]
        param_name = names[i]
        if param_name:   # parameterized node: invert the decode name fixes
            cell_ind, stored = _stored_name(param_name, ops[i], n_cells)
        else:            # op node (cat/sum/pool/input/...): store the base name
            cell_ind = int(cells[i])
            stored = '' if base == 'input' else base
        if i == n - 1 and base == 'bias':
            ext = 'fc-b'
        else:
            ext = _ext_primitive(base, None if sz is None else tuple(sz))
        nodes_ext.append(ext)
        nodes_cell.append(cell_ind)
        nodes_name.append(stored)
    adj = np.asarray(g.adj, dtype=np.int16)
    return adj, (nodes_ext, nodes_cell, nodes_name)


# net-arg sampling mirroring the training distribution knobs the reference
# loader understands (wider_nets handling lives in the LOADER; the writer
# stores the raw sampled args)
def sample_net_args(rng: np.random.Generator, ops: Optional[Sequence[str]] = None,
                    steps_choices=(1, 2), cells_choices=(2, 3, 4),
                    c_choices=(8, 16, 32), fc_dim_choices=(256,),
                    c_mult_choices=(1, 2), fc_layers_choices=(1, 2),
                    glob_avg_p: float = 0.9,
                    imagenet: bool = False, norm: str = 'bn',
                    norm_free_p: float = 0.0) -> dict:
    # norm_free_p: fraction of sampled nets with NO normalization layers
    # (norm=None). The published training distribution is all-BN — bnfree is
    # an OOD split — so this stays 0.0 for reference-protocol datasets; it
    # exists for positive-control experiments (can the same GHN learn
    # norm-free-viable weight scales when the training distribution covers
    # them?). See RESULTS.md "bnfree" section.
    if norm_free_p > 0 and rng.random() < norm_free_p:
        norm = None
    kw = {'ops': tuple(ops)} if ops else {}
    geno = random_genotype(rng, steps=int(rng.choice(steps_choices)), **kw)
    # flatten heads (glob_avg=False) use the reference Network's FIXED
    # flattened-feature table (ops.py:497-500); msa/cse stride semantics can
    # produce spatial sizes the table does not cover, and the reference
    # Network itself crashes on such nets (verified: identical shape-mismatch
    # error, reference vs ours) — so like the published generator, never
    # emit flatten heads for msa/cse genotypes
    special = any(o in ('msa', 'cse') for o, _ in geno.normal + geno.reduce)
    return dict(genotype=geno,
                n_cells=int(rng.choice(cells_choices)),
                C=int(rng.choice(c_choices)),
                glob_avg=True if special else bool(rng.random() < glob_avg_p),
                preproc=True,
                C_mult=int(rng.choice(c_mult_choices)),
                fc_layers=int(rng.choice(fc_layers_choices)),
                fc_dim=int(rng.choice(fc_dim_choices)),
                stem_type=int(rng.choice((0, 1))) if imagenet else 0,
                stem_pool=bool(rng.random() < 0.5) if imagenet else False,
                norm=norm,
                ks=3)


# Out-of-distribution eval splits, mirroring the published dataset's split
# vocabulary (ppuda DeepNets-1M; consumed by the reference at eval_ghn.py:94-102
# via `--split wide/deep/dense/bnfree`). Each entry maps a split name to the
# sampling overrides that define its distribution shift relative to train:
#   test   — in-distribution (same sampler as train/val)
#   wide   — stored args are in-distribution; the LOADER widens C 4x (2x for
#            large images) at decode time, matching the published mechanism
#            (data/deepnets1m.py `self.split == 'wide'`)
#   deep   — 2x the cell-count pool (deeper networks than ever trained on)
#   dense  — 2x the steps pool (denser cells: more ops and skip wiring)
#   bnfree — no normalization layers anywhere (norm=None)
def _ood_overrides(split: str, sample_kw: dict) -> dict:
    kw = dict(sample_kw)
    if split == 'deep':
        cells = kw.get('cells_choices', (2, 3, 4))
        kw['cells_choices'] = tuple(2 * c for c in cells)
    elif split == 'dense':
        steps = kw.get('steps_choices', (1, 2))
        kw['steps_choices'] = tuple(2 * s for s in steps)
    elif split == 'bnfree':
        kw['norm'] = None
    return kw


def write_dataset(out_dir: str, n_train: int = 64, n_val: int = 8,
                  num_classes: int = 10, imagenet: bool = False,
                  seed: int = 0, ve_cutoff: int = 50,
                  ops: Optional[Sequence[str]] = None,
                  log_every: int = 0, n_test: int = 0, n_wide: int = 0,
                  n_deep: int = 0, n_dense: int = 0, n_bnfree: int = 0,
                  n_search: int = 0, **sample_kw) -> str:
    """Write ``deepnets1m_train.hdf5`` / ``deepnets1m_eval.hdf5`` +
    ``deepnets1m_meta.json`` in the published layout under ``out_dir``.

    ``n_test``/``n_wide``/``n_deep``/``n_dense``/``n_bnfree`` add the published
    out-of-distribution eval splits (all groups of the eval file; see
    :func:`_ood_overrides`). train/val sampling is unchanged for a given seed —
    extra splits draw from the rng stream *after* train/val, so adding them to
    an existing recipe preserves its train/val content byte for byte."""
    import h5py

    rng = np.random.default_rng(seed)
    prim_ext: Dict[str, str] = {}
    op_names: Dict[str, str] = {}

    def intern(table: Dict[str, str], value: str) -> int:
        for k, v in table.items():
            if v == value:
                return int(k)
        k = len(table)
        table[str(k)] = value
        return k

    def geno_dict(geno: Genotype) -> dict:
        return {'normal': [[o, s] for o, s in geno.normal],
                'normal_concat': list(geno.normal_concat),
                'reduce': [[o, s] for o, s in geno.reduce],
                'reduce_concat': list(geno.reduce_concat)}

    os.makedirs(out_dir, exist_ok=True)
    meta: dict = {'meta': {'primitives_ext': prim_ext, 'op_names_net': op_names}}

    def write_split(grp, split: str, count: int) -> List[dict]:
        kw = _ood_overrides(split, sample_kw)
        nets_meta = []
        written = 0
        while written < count:
            args = sample_net_args(rng, ops=ops, imagenet=imagenet, **kw)
            try:
                g = build_genotype_graph(num_classes=num_classes,
                                         is_imagenet_input=imagenet,
                                         ve_cutoff=ve_cutoff,
                                         **args)
                adj, (exts, cells, names) = graph_record(g, args['n_cells'])
            except Exception:
                continue  # unbuildable sample (e.g. empty concat): resample
            nodes = np.zeros((len(exts), 3), dtype=np.int64)
            for i, (e, c, nm) in enumerate(zip(exts, cells, names)):
                nodes[i] = (intern(prim_ext, e), c, intern(op_names, nm))
            sub = grp.create_group(str(written))
            sub.create_dataset('adj', data=adj)
            sub.create_dataset('nodes', data=nodes)
            row = dict(args)
            row['genotype'] = geno_dict(args['genotype'])
            row['num_nodes'] = int(len(exts))
            n_params = int(sum(int(np.prod(sz)) for sz in g.param_shapes
                               if sz is not None))
            row['num_params'] = {'cifar10': n_params, 'imagenet': n_params}
            nets_meta.append(row)
            written += 1
            if log_every and written % log_every == 0:
                print(f'{split}: {written}/{count}')
        return nets_meta

    with h5py.File(os.path.join(out_dir, 'deepnets1m_train.hdf5'), 'w') as f:
        meta['train'] = {'nets': write_split(f.create_group('train'), 'train',
                                             n_train)}
    eval_counts = [('val', n_val), ('test', n_test), ('wide', n_wide),
                   ('deep', n_deep), ('dense', n_dense), ('bnfree', n_bnfree)]
    with h5py.File(os.path.join(out_dir, 'deepnets1m_eval.hdf5'), 'w') as f:
        for split, count in eval_counts:
            if split != 'val' and count <= 0:
                continue
            meta[split] = {'nets': write_split(f.create_group(split), split,
                                               count)}
    if n_search > 0:
        # the published layout keeps the NAS 'search' split in its own file
        # (loader h5_name rule; in-distribution sampling, train-mode decode).
        # Written LAST in the rng stream so adding it to a recipe never
        # changes the content of any other split.
        with h5py.File(os.path.join(out_dir, 'deepnets1m_search.hdf5'), 'w') as f:
            meta['search'] = {'nets': write_split(f.create_group('search'),
                                                  'search', n_search)}
    with open(os.path.join(out_dir, 'deepnets1m_meta.json'), 'w') as f:
        json.dump(meta, f)
    return out_dir
