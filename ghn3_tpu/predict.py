"""End-to-end parameter prediction: GraphBatch -> decoded target parameters.

Pipeline (reference stack 3.1 in SURVEY.md, redesigned for TPU):

  host:   match graph nodes to target params, build shape indices + a static
          DecodePlan (groups keyed by canonical decode shape, items sorted so
          identical target shapes form vectorizable runs)
  device: graphormer forward over the padded batch (one XLA program per bucket);
          decode + tile + normalize fused per plan signature

Three execution modes share the same plan:
  * ``predict_packed`` (functional JAX targets): one fused program emits a
    single packed buffer that never leaves the device; targets get lazy
    PackedParams views (zero host copies).
  * ``predict_batch``/``run_plan`` with ``to_host=True`` (torch targets): the
    COMPACT decoded groups are fetched once (~50x smaller than the tiled
    parameters) and tiled/normalized with numpy on the host.
  * ``run_plan(traced=True)`` inside the training step: the same ops inline
    into the enclosing trace, differentiable end to end.

Decode-group gathers use per-graph slab offsets (b * N_pad + node), so batched
prediction is identical to per-model prediction (see GraphBatch docstring for the
reference deviation here).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GHNConfig
from .graph.graphdef import GraphBatch
from .models import ghn_core
from .models.shape_encoder import tables_for
from .ops.assembly import decode_key, normalize_params, tile_params, tile_params_flat


# A target parameter record: shape, weight/bias flag, and a setter receiving the
# final tensor. Target frontends (torch interop, JAX functional nets) build
# per-cell dicts of these — the equivalent of ppuda's named_layered_modules.
@dataclasses.dataclass
class TargetParam:
    sz: Tuple[int, ...]
    is_w: bool
    set_fn: Callable[[np.ndarray, bool], None]   # (tensor, is_weight) -> None


TargetTable = List[Dict[str, TargetParam]]       # per-cell param tables


@dataclasses.dataclass
class GroupItem:
    flat_idx: int                 # b * N_pad + node_ind
    record: TargetParam
    target_sz: Tuple[int, ...]
    net_index: int = 0            # which target in the batch
    name: str = ''                # matched parameter name in the target table


@dataclasses.dataclass
class DecodePlan:
    groups: Dict[Tuple[int, ...], List[GroupItem]]
    shape_ind: np.ndarray         # (B, N_pad, 4) int32
    n_unmatched: int


def _candidate_names(p_name: str) -> List[str]:
    if not p_name.endswith(('.weight', '.bias', 'in_proj_weight', 'in_proj_bias')):
        p_name = p_name + '.weight'
    return [p_name, p_name.replace('to_qkv', 'attn.to_qkv').replace('to_out', 'attn.to_out')]


_UNMATCHED_OK = ('input', 'sum', 'concat', 'pool', 'glob_avg', 'msa', 'cse')


def build_plan(batch: GraphBatch, tables: Sequence[TargetTable], cfg: GHNConfig,
               reduce_graph: bool = False, sanity_check: bool = False) -> DecodePlan:
    """Match graph nodes to target parameters (reference `_map_net_params`,
    nn.py:594-692) and build the shape-encoder index array."""
    shape_tables = tables_for(cfg)
    b_count = len(batch)
    n_pad = batch.n_pad
    shape_ind = np.tile(np.array(shape_tables.dummy_index, dtype=np.int32),
                        (b_count, n_pad, 1))
    groups: Dict[Tuple[int, ...], List[GroupItem]] = {}
    n_unmatched = 0

    for b, (graph, table) in enumerate(zip(batch.graphs, tables)):
        table = [dict(cell) for cell in table] if reduce_graph else table
        base = batch.slab_offset(b)
        for cell_id, cell_info in enumerate(graph.node_info):
            cell_table = table[cell_id] if cell_id < len(table) else {}
            for row in cell_info:
                matched: Optional[TargetParam] = None
                matched_name = None
                for name in _candidate_names(row.param_name):
                    if name in cell_table:
                        matched = cell_table[name]
                        matched_name = name
                        break
                if matched is None:
                    n_unmatched += 1
                    if row.sz is not None:
                        shape_ind[b, row.node_ind] = shape_tables.shape_index(row.sz)
                    if sanity_check and not any(row.op.find(p) >= 0 for p in _UNMATCHED_OK):
                        raise ValueError(
                            f'unmatched graph node: cell {cell_id}, param {row.param_name!r}, '
                            f'op {row.op!r}; target table keys: {sorted(cell_table)[:20]}')
                    continue
                sz = tuple(matched.sz)
                shape_ind[b, row.node_ind] = shape_tables.shape_index(sz)
                key = decode_key(sz, cfg.max_shape, row.is_last_weight, row.is_last_bias)
                groups.setdefault(key, []).append(
                    GroupItem(flat_idx=base + row.node_ind, record=matched, target_sz=sz,
                              net_index=b, name=matched_name))
                if reduce_graph:
                    del cell_table[matched_name]
    # sort items so identical (shape, kind) entries are adjacent: the assembly
    # program vectorizes over these runs (program size ~ #distinct shapes)
    for items in groups.values():
        items.sort(key=lambda it: (len(it.target_sz), it.target_sz, not it.record.is_w))
    return DecodePlan(groups=groups, shape_ind=shape_ind, n_unmatched=n_unmatched)


# ---------------------------------------------------------------------------
# jitted programs (cached per static signature)
# ---------------------------------------------------------------------------

def _precision(cfg: GHNConfig) -> str:
    # full fp32 matmuls for checkpoint parity; bf16 mode trades parity for speed
    if cfg.matmul_precision is not None:
        return cfg.matmul_precision
    return 'highest' if cfg.dtype == 'float32' else 'default'


@functools.lru_cache(maxsize=None)
def _forward_fn(cfg: GHNConfig):
    def fwd(params, node_op, adj, shape_ind, mask, levels):
        with jax.default_matmul_precision(_precision(cfg)):
            x = ghn_core.ghn_forward(params, cfg, node_op, adj, shape_ind, mask,
                                     levels=levels)
        return x.reshape(-1, cfg.hid)
    return jax.jit(fwd)


def batch_levels(batch: GraphBatch) -> np.ndarray:
    """Topological levels per graph (GHN-2 GatedGNN sequential propagation)."""
    from .models.gatedgnn import topo_levels
    return np.stack([topo_levels(g.adj, batch.n_pad) for g in batch.graphs])


def forward_embeddings(params, cfg: GHNConfig, batch: GraphBatch,
                       shape_ind: np.ndarray) -> jnp.ndarray:
    """(B*N_pad, hid) node embeddings after the propagation stack (jitted)."""
    levels = batch_levels(batch) if cfg.is_ghn2 else np.zeros_like(batch.node_op)
    return _forward_fn(cfg)(params, jnp.asarray(batch.node_op), jnp.asarray(batch.adj),
                            jnp.asarray(shape_ind), jnp.asarray(batch.mask),
                            jnp.asarray(levels))


def _group_bucket(g: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, g)))))


def decode_group(params, cfg: GHNConfig, key: Tuple[int, ...], x_g, z=None):
    """Decode one shape-key group (traceable). ``z`` optionally supplies the
    precomputed shared fc stage (ghn_core.decode_conv_fc) for the conv paths."""
    with jax.default_matmul_precision(_precision(cfg)):
        if len(key) == 2 and key[1] > 0:      # classification weight
            return ghn_core.decode_conv(params, cfg, x_g, (key[0], key[1], 1, 1),
                                        class_pred=True, z=z)
        if len(key) == 2 and key[1] < 0:      # classification bias
            w = ghn_core.decode_1d(params, x_g).reshape(x_g.shape[0], 2, -1)
            return ghn_core.decode_bias_class(params, w)
        if len(key) == 2:                     # 1d (norm weight/bias pairs, biases)
            return ghn_core.decode_1d(params, x_g).reshape(x_g.shape[0], 2, -1)
        if len(key) == 3:                     # 3d (e.g. layer_scale)
            return ghn_core.decode_1d(params, x_g).reshape(x_g.shape[0], -1, 1, 1)
        return ghn_core.decode_conv(params, cfg, x_g, key, class_pred=False, z=z)


@functools.lru_cache(maxsize=None)
def _decode_all_fn(cfg: GHNConfig, keys: Tuple[Tuple[int, ...], ...]):
    """One fused program decoding every shape-key group of a plan: a single XLA
    compile per plan signature instead of one per key (compile latency dominates
    sweep startup on TPU)."""
    def run(params, x_groups):
        return tuple(decode_group(params, cfg, key, x_g)
                     for key, x_g in zip(keys, x_groups))
    return jax.jit(run)


def _runs(items_sig):
    """Consecutive runs of identical (target_sz, is_w) within a group (plan items
    are sorted, so equal shapes are adjacent): [(start, count, target_sz, is_w)]."""
    runs = []
    i = 0
    while i < len(items_sig):
        sz, is_w = items_sig[i]
        j = i
        while j < len(items_sig) and items_sig[j] == (sz, is_w):
            j += 1
        runs.append((i, j - i, tuple(sz), bool(is_w)))
        i = j
    return runs


def _normalize_block(block, target_sz, is_w: bool, unit_var: bool = False):
    """Batched fan-in normalization: same rules as ops.assembly.normalize_params,
    decided from the (static) target shape; ``block`` has a leading run axis."""
    import math
    sz = tuple(target_sz)
    if len(sz) > 1:
        if len(sz) > 2 and sz[2] >= 11 and sz[0] == 1:
            return block  # positional encodings are not normalized
        no_relu = len(sz) > 2 and (sz[1] == 1 or sz[2] < sz[3])
        beta = 1.0 if no_relu else 2.0
        if unit_var:   # per-tensor RMS along all but the run axis (config.py)
            axes = tuple(range(1, block.ndim))
            rms = jnp.sqrt((block * block).mean(axis=axes, keepdims=True))
            block = block / (rms + 1e-8)
        return block * math.sqrt(beta / max(1, int(np.prod(sz[1:]))))
    if is_w:
        return 2.0 / (1.0 + jnp.exp(-0.5 * block))
    return jnp.tanh(0.2 * block)


def _emit_blocks(decoded, items_sig, weight_norm: bool, corner: bool = False,
                 unit_var: bool = False):
    """Tile/normalize a decoded group as vectorized runs. Returns a list of
    (start, count, target_sz, pair_it, block) where ``block`` is (count, *sz).
    vmap over identical-shape runs keeps the program size proportional to the
    number of distinct shapes, not the number of tensors."""
    out = []
    for start, count, sz, is_w in _runs(items_sig):
        sub = decoded[start:start + count]
        tile = jax.vmap(lambda t, sz=sz: tile_params(t, sz, corner=corner))
        if len(sz) == 1:
            rows = ([sub[:, 0], sub[:, 1]] if is_w else [sub[:, 1]])
            for pair_it, row in enumerate(rows):
                block = tile(row)
                if weight_norm:
                    block = _normalize_block(block, sz, is_w and pair_it == 0,
                                             unit_var=unit_var)
                out.append((start, count, sz, pair_it, block))
        else:
            if len(sz) == 4 and not isinstance(decoded, np.ndarray) \
                    and getattr(sub, 'ndim', 0) == 5:
                # device path: flat tiling keeps kernel dims out of the two
                # minormost layout positions (assembly.tile_params_flat)
                tile = jax.vmap(lambda t, sz=sz: tile_params_flat(
                    t, sz, corner=corner))
            block = tile(sub)
            if weight_norm:
                block = _normalize_block(block, sz, is_w, unit_var=unit_var)
            out.append((start, count, sz, 0, block))
    return out


def _iter_slots(signature):
    """Canonical traversal of the packed buffer: yields
    (group_idx, item_idx, pair_it, target_sz, offset) in program emission order."""
    offset = 0
    for gi, (key, items_sig) in enumerate(signature):
        for start, count, sz, is_w in _runs(items_sig):
            n_pair = 2 if (len(sz) == 1 and is_w) else 1
            size = int(np.prod(sz))
            for pair_it in range(n_pair):
                for j in range(count):
                    yield gi, start + j, pair_it, sz, offset
                    offset += size


@functools.lru_cache(maxsize=None)
def _assemble_all_fn(cfg: GHNConfig, signature, weight_norm: bool):
    """The full device-side assembly program: gather group embeddings, decode,
    tile to target shapes and fan-in-normalize — one XLA program per plan
    signature, with a SINGLE packed flat output buffer (hundreds of small
    outputs are slow to compile and to fetch through PJRT).

    ``signature`` = tuple of (key, ((target_sz, is_w), ...)) per group.
    """
    def run(params, x_flat, inds_groups):
        with jax.default_matmul_precision(_precision(cfg)):
            pieces = []
            for (key, items_sig), inds in zip(signature, inds_groups):
                x_g = jnp.take(x_flat, inds, axis=0)
                decoded = decode_group(params, cfg, key, x_g)
                for _, _, _, _, block in _emit_blocks(
                        decoded, items_sig, weight_norm, corner=cfg.is_ghn2,
                        unit_var=getattr(cfg, 'unit_var_norm', False)):
                    pieces.append(block.reshape(-1))
            return jnp.concatenate(pieces)
    return jax.jit(run)


class PackedParams:
    """Lazy view over a packed parameter buffer: ``view[name]`` slices/reshapes,
    which is free when accessed inside a jitted target-net apply. Quacks like the
    param dict functional nets consume."""

    def __init__(self, buffer, spec: Dict[str, Tuple[int, Tuple[int, ...]]]):
        self.buffer = buffer
        self.spec = dict(spec)

    def with_buffer(self, buffer) -> 'PackedParams':
        return PackedParams(buffer, self.spec)

    def get(self, name, default=None):
        if name not in self.spec:
            return default
        offset, shape = self.spec[name]
        size = int(np.prod(shape))
        return self.buffer[offset:offset + size].reshape(shape)

    def __getitem__(self, name):
        out = self.get(name)
        if out is None:
            raise KeyError(name)
        return out

    def __contains__(self, name):
        return name in self.spec

    def __len__(self):
        return len(self.spec)

    def keys(self):
        return self.spec.keys()

    def values(self):
        return (self[k] for k in self.spec)

    def items(self):
        return ((k, self[k]) for k in self.spec)


def _assemble_item(item: GroupItem, w_node, weight_norm: bool,
                   rng: Optional[np.random.Generator], corner: bool = False,
                   unit_var: bool = False) -> None:
    """Tile/normalize one node's decoded tensor(s) on host and hand them to the
    setter (torch-target path)."""
    sz = item.target_sz
    n_iter = 2 if (len(sz) == 1 and item.record.is_w) else 1
    for it in range(n_iter):
        if len(sz) == 1:
            # norm weight/bias channel pair: row 0 = weight, row 1 = bias
            w_ = w_node[1 - int(item.record.is_w) + it]
        else:
            w_ = w_node
        tiled = tile_params(w_, sz, rng=rng, corner=corner)
        is_w = bool(item.record.is_w) and it == 0
        if weight_norm:
            tiled = normalize_params(tiled, is_w, unit_var=unit_var)
        item.record.set_fn(np.ascontiguousarray(tiled), is_w)


def run_plan(params, cfg: GHNConfig, x_flat, plan: DecodePlan,
             predict_class_layers: bool = True,
             weight_norm: Optional[bool] = None,
             rng: Optional[np.random.Generator] = None,
             traced: bool = False,
             to_host: bool = True) -> None:
    """Decode every group in the plan and assign tensors through the setters.

    :param traced: inline the ops into an enclosing trace (differentiable, for
        the training step) instead of calling the cached fused program.
    :param to_host: fetch the assembled tensors to host numpy in one batched
        transfer (required for torch targets); False keeps them on device for
        functional JAX targets.
    """
    weight_norm = cfg.weight_norm if weight_norm is None else weight_norm
    active = []
    for key, items in plan.groups.items():
        is_cls = len(key) == 2 and key[1] != 0
        if is_cls and not predict_class_layers:
            continue
        active.append((key, items))
    if not active:
        return

    if traced:
        # inside an outer trace (training step): inline the same vectorized-run
        # ops; per-item rows are trace-time slices (free after fusion)
        for key, items in active:
            g = len(items)
            inds = np.zeros((_group_bucket(g),), dtype=np.int32)
            inds[:g] = [it.flat_idx for it in items]
            x_g = jnp.take(x_flat, jnp.asarray(inds), axis=0)
            decoded = decode_group(params, cfg, key, x_g)
            items_sig = tuple((tuple(it.target_sz), bool(it.record.is_w)) for it in items)
            for start, count, sz, pair_it, block in _emit_blocks(
                    decoded, items_sig, weight_norm, corner=cfg.is_ghn2,
                    unit_var=getattr(cfg, 'unit_var_norm', False)):
                for j in range(count):
                    item = items[start + j]
                    val = block[j]
                    if len(sz) == 4 and val.ndim == 2:
                        # flat-tiled conv block (tile_params_flat): restore the
                        # target shape; inside the trace this reshape fuses into
                        # the consuming conv
                        val = val.reshape(sz)
                    item.record.set_fn(val, bool(item.record.is_w) and pair_it == 0)
        return

    if to_host:
        # host-side targets (torch): fetch the COMPACT decoded groups (the
        # pre-tiling representation is ~50x smaller than the tiled parameters,
        # which matters through a slow device link) and tile/normalize in numpy
        keys = tuple(key for key, _ in active)
        x_groups = []
        for key, items in active:
            g = len(items)
            inds = np.zeros((_group_bucket(g),), dtype=np.int32)
            inds[:g] = [it.flat_idx for it in items]
            x_groups.append(jnp.take(x_flat, jnp.asarray(inds), axis=0))
        decoded_all = _decode_all_fn(cfg, keys)(params, tuple(x_groups))
        decoded_all = [np.asarray(d) for d in jax.device_get(decoded_all)]
        for (key, items), decoded in zip(active, decoded_all):
            for w_ind, item in enumerate(items):
                _assemble_item(item, decoded[w_ind], weight_norm, rng,
                               corner=cfg.is_ghn2,
                               unit_var=getattr(cfg, 'unit_var_norm', False))
        return

    # functional targets: one fused XLA program (gather + decode + tile +
    # normalize) emits a single packed buffer that never leaves the device
    packed, signature = _run_packed(params, cfg, x_flat, active, weight_norm)
    for gi, item_idx, pair_it, sz, offset in _iter_slots(signature):
        item = active[gi][1][item_idx]
        size = int(np.prod(sz))
        tensor = packed[offset:offset + size].reshape(sz)
        item.record.set_fn(tensor, bool(item.record.is_w) and pair_it == 0)


def _run_packed(params, cfg: GHNConfig, x_flat, active, weight_norm: bool):
    signature = tuple(
        (key, tuple((tuple(it.target_sz), bool(it.record.is_w)) for it in items))
        for key, items in active)
    inds_groups = []
    for key, items in active:
        g = len(items)
        inds = np.zeros((_group_bucket(g),), dtype=np.int32)
        inds[:g] = [it.flat_idx for it in items]
        inds_groups.append(jnp.asarray(inds))
    packed = _assemble_all_fn(cfg, signature, weight_norm)(params, x_flat,
                                                           tuple(inds_groups))
    return packed, signature


def _pair_bias_name(name: str) -> str:
    return name[:-len('.weight')] + '.bias' if name.endswith('.weight') else name + '.bias'


def plan_stats(plan: DecodePlan) -> Dict[str, int]:
    """Predicted-tensor accounting (reference debug_level>=1, nn.py:354-397):
    number of tensors and parameters the plan will produce."""
    n_tensors = 0
    n_params = 0
    for key, items in plan.groups.items():
        for it in items:
            sz = it.target_sz
            n_iter = 2 if (len(sz) == 1 and it.record.is_w) else 1
            n_tensors += n_iter
            n_params += n_iter * int(np.prod(sz))
    return {'n_tensors_pred': n_tensors, 'n_params_pred': n_params}


def verify_all_predicted(plan: DecodePlan, tables: Sequence[TargetTable]) -> Dict[str, int]:
    """Compare plan coverage against the targets' declared parameter totals and
    log the reference-style summary; raises if any target tensor is missed."""
    from .utils.logging import log
    stats = plan_stats(plan)
    total_tensors = 0
    total_params = 0
    for table in tables:
        for cell in table:
            for rec in cell.values():
                total_tensors += 1
                total_params += int(np.prod(rec.sz))
    stats['n_params_target'] = total_params
    matched = stats['n_params_pred'] == total_params
    log('number of parameter tensors predicted using GHN: {}, total parameters '
        'predicted: {} ({})'.format(stats['n_tensors_pred'], stats['n_params_pred'],
                                    'matched!' if matched else
                                    f'error! not matched with {total_params} target params'))
    if not matched:
        raise ValueError(f'not all params predicted: {stats}')
    return stats


def predict_packed(params, cfg: GHNConfig, batch: GraphBatch,
                   tables: Sequence[TargetTable],
                   predict_class_layers: bool = True,
                   weight_norm: Optional[bool] = None,
                   sanity_check: bool = False) -> List[PackedParams]:
    """Zero-host-copy prediction for functional JAX targets: returns one
    PackedParams view per target (params stay on device; name lookups slice the
    packed buffer lazily, fused into the consumer's jit)."""
    weight_norm = cfg.weight_norm if weight_norm is None else weight_norm
    plan = build_plan(batch, tables, cfg, sanity_check=sanity_check)
    x_flat = forward_embeddings(params, cfg, batch, plan.shape_ind)

    active = []
    for key, items in plan.groups.items():
        is_cls = len(key) == 2 and key[1] != 0
        if is_cls and not predict_class_layers:
            continue
        active.append((key, items))
    if not active:
        raise ValueError(
            'decode plan matched ZERO target parameters '
            f'({plan.n_unmatched} graph nodes unmatched) — graph param names '
            'and the target table disagree (stale graph cache? mismatched '
            'zoo twin?)')
    packed, signature = _run_packed(params, cfg, x_flat, active, weight_norm)
    specs: List[Dict[str, Tuple[int, Tuple[int, ...]]]] = [dict() for _ in range(len(batch))]
    for gi, item_idx, pair_it, sz, offset in _iter_slots(signature):
        item = active[gi][1][item_idx]
        name = item.name if (pair_it == 0 and item.record.is_w) or not item.record.is_w \
            else _pair_bias_name(item.name)
        specs[item.net_index][name] = (offset, tuple(sz))
    return [PackedParams(packed, spec) for spec in specs]


def predict_batch(params: Dict[str, jnp.ndarray], cfg: GHNConfig, batch: GraphBatch,
                  tables: Sequence[TargetTable],
                  predict_class_layers: bool = True,
                  weight_norm: Optional[bool] = None,
                  reduce_graph: bool = False,
                  sanity_check: bool = False,
                  rng: Optional[np.random.Generator] = None,
                  to_host: bool = True) -> DecodePlan:
    """Predict and assign parameters for every target in the batch (eval mode)."""
    plan = build_plan(batch, tables, cfg, reduce_graph=reduce_graph,
                      sanity_check=sanity_check)
    x_flat = forward_embeddings(params, cfg, batch, plan.shape_ind)
    run_plan(params, cfg, x_flat, plan, predict_class_layers=predict_class_layers,
             weight_norm=weight_norm, rng=rng, to_host=to_host)
    return plan
