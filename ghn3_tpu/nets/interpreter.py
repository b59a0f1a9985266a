"""Genotype-as-data super-net executor for DeepNets-1M meta-training.

The compile wall this kills: tracing a different Python ``Network`` per sampled
architecture compiles one XLA program per meta-batch (the reference streams a
fresh meta-batch from 1M nets every step, /root/reference/ghn3/deepnets1m.py:282-319,
consumed at trainer.py:308-327 — on TPU that is minutes of compilation per step).

Here the architecture is *data*:

* one XLA program is compiled per coarse static **bucket** (channel width C,
  cell count, steps, stem family, norm kind, classifier dims — ``ArchBucket``);
* the genotype's content — which op sits in each cell slot, its input state,
  which graph nodes hold its parameters, what the cell concatenates — is packed
  into integer tensors (``encode_arch``) and fed as ordinary inputs;
* inside the program, each cell slot dispatches over a static op vocabulary with
  ``lax.switch`` (only the selected branch executes on TPU), and each branch
  **fuses the GHN decode**: it gathers the node embeddings it needs from the
  graphormer output and runs decode -> tile -> fan-in-normalize -> conv inline,
  with fully static shapes. Gradients flow through decode into the GHN.

Numerics match the per-architecture executor (predict_packed + nets/darts.Network)
tensor-for-tensor: the branches reuse ``predict.decode_group`` /
``ops.assembly.tile_params`` / ``normalize_params`` with the same decode keys
(tests/test_interpreter.py asserts logits equality).

Reference semantics mirrored: ops.py OPS table (/root/reference/ghn3/ops.py:332-400),
Cell/Network forward (ops.py:403-576); ``None``-state propagation of Zero ops is
genotype-static, so the host encoder rewrites ops on dead states to 'none' and the
device uses zero tensors (bn-on-zero never happens, matching torch's None skips).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GHNConfig
from ..graph.genotypes import Genotype, parse_op_ks
from ..graph.graphdef import GraphDef
from ..models.shape_encoder import tables_for
from ..ops.assembly import decode_key, normalize_params, tile_params

MAX_SLOT_NODES = 9   # msa is the widest op: ln1, qkv, out.w, out.b, ln2, ff0.w/b, ff3.w/b


def _scan_unroll() -> bool:
    """Whether the per-cell step scans unroll fully.

    On TPU, steps is static and tiny (<=4) and unrolling makes the bank-update
    index a constant per iteration, so XLA SSAs away the whole-bank copies the
    rolled scan would materialize (0.53 -> 0.37 s/step measured). On CPU the
    same unroll only bloats the LLVM functions XLA:CPU has to chew through —
    multi-minute compiles, and observed compiler segfaults on single-core
    hosts — with no runtime win, so the rolled scan is used there.
    Override with GHN3_INTERP_UNROLL=0/1."""
    import os
    env = os.environ.get('GHN3_INTERP_UNROLL')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() != 'cpu'

# Op vocabulary: (base, kernel) pairs the branch tables carry. Restrictable per
# dataset (a smaller vocabulary compiles faster); ids are positions in the tuple.
DEFAULT_VOCAB: Tuple[Tuple[str, int], ...] = (
    ('none', 3), ('skip_connect', 3), ('avg_pool', 3), ('max_pool', 3),
    ('conv', 1), ('conv', 3), ('conv', 5), ('conv', 7),
    ('conv2', 3), ('conv2', 5), ('conv2', 7),
    ('sep_conv', 3), ('sep_conv', 5), ('sep_conv', 7),
    ('dil_conv', 3), ('dil_conv', 5), ('dil_conv', 7),
    ('msa', 3), ('cse', 3),
)


def vocab_from_genotypes(genotypes: Sequence[Genotype],
                         ) -> Tuple[Tuple[str, int], ...]:
    """Smallest op vocabulary covering the given genotypes (+ 'none'). A smaller
    vocabulary means smaller lax.switch tables, i.e. faster bucket compiles —
    derive it from the dataset's primitives once, not per meta-batch (the vocab
    is part of the bucket key)."""
    seen = {('none', 3)}
    for g in genotypes:
        for op, _src in list(g.normal) + list(g.reduce):
            seen.add(parse_op_ks(op))
    return tuple(sorted(seen))


_OP_BASES = ('none', 'skip_connect', 'avg_pool', 'max_pool', 'conv', 'conv2',
             'sep_conv', 'dil_conv', 'msa', 'cse')


def vocab_from_primitives(names: Sequence[str]) -> Tuple[Tuple[str, int], ...]:
    """Vocabulary from a dataset's extended primitive names (e.g. the
    ``primitives_ext`` table of DeepNets-1M metadata): keeps genotype ops,
    ignores node-level primitives (bn/bias/input/...)."""
    seen = {('none', 3)}
    for name in names:
        if name is None:
            continue
        base, k = parse_op_ks(name)
        if base in _OP_BASES:
            seen.add((base, k))
    return tuple(sorted(seen))


# Width folding: channel counts are padded UP to the next class so that nets of
# different true widths share one compiled program, with the true width carried
# as data. This is numerically EXACT because the decoder computes the full
# (max_shape[0], max_shape[1]) block and every smaller decode is a slice of it
# (reference ConvDecoder3.forward, nn.py:736-760: reshape at out_shape[:2] then
# `x[:, :, :max_shape[1]]` / `x[:, :max_shape[0]]`), and parameter tiling is
# cyclic — so tiling to the padded width and masking rows/cols beyond the true
# width reproduces the true-width tensors bit for bit (tests/test_interpreter.py
# ::test_width_folding_matches_exact). Folding cuts the wider_nets bucket
# cardinality by the |num_ch| x |fc_dim| factor (7x8 = 56 in the reference
# sampling, deepnets1m.py:99-133); see tools/bucket_stats.py.
WIDTH_CLASSES = (32, 64, 128, 256, 512)
FC_CLASSES = (512,)
# Cell slot-count / concat-length padding classes ("pad steps/mult to family
# maxima"): padded slots run the 'none' branch and padded concat segments are
# zeros removed by compaction, so genotypes of different step/concat counts
# share one program.
STEP_CLASSES = (2, 4)
MULT_CLASSES = (2, 4, 6)


def pad_class(v: int, classes: Tuple[int, ...]) -> int:
    for c in classes:
        if v <= c:
            return c
    return v


@dataclasses.dataclass(frozen=True)
class ArchBucket:
    """Static configuration of one compiled interpreter program. Everything that
    determines tensor shapes lives here; genotype content is data. Under width
    folding, ``C``/``fc_dim`` are the PROGRAM (padded) widths and the net's true
    widths ride in the arch data (``c_true``/``fc_true``)."""
    C: int
    n_cells: int
    steps_normal: int
    steps_reduce: int
    mult_normal: int          # len(normal_concat)
    mult_reduce: int
    stem_type: int            # 0, 1, or 2 (ViT conv_stride + pos_enc)
    stem_pool: bool
    preproc: bool
    C_mult: int
    has_norm: bool
    ks: int
    glob_avg: bool
    fc_layers: int
    fc_dim: int
    num_classes: int
    is_imagenet_input: bool
    imagenet_stride: int
    input_size: int = 0        # 0 = default (224 imagenet / 32 otherwise)
    vocab: Tuple[Tuple[str, int], ...] = DEFAULT_VOCAB
    c_folded: bool = False     # C is a padded class; true width is arch data
    fc_folded: bool = False    # fc_dim is padded; true fc width is arch data
    sm_folded: bool = False    # steps/mult are padded; true mults are arch data

    @property
    def image_size(self) -> int:
        return self.input_size or (224 if self.is_imagenet_input else 32)

    @property
    def is_vit(self) -> bool:
        return self.stem_type == 2

    @property
    def max_slots(self) -> int:
        return 2 * max(self.steps_normal, self.steps_reduce)

    @property
    def max_mult(self) -> int:
        return max(self.mult_normal, self.mult_reduce)


def _conv_out(h: int, k: int, s: int, p: int, d: int = 1) -> int:
    return (h + 2 * p - d * (k - 1) - 1) // s + 1


@dataclasses.dataclass(frozen=True)
class CellGeom:
    """Per-cell static geometry (channels, resolutions, kind)."""
    cell: int
    reduction: bool
    reduction_prev: bool
    c: int                    # op channels inside the cell (c_in == c_out, see ops.py:449)
    c_prev_prev: int
    c_prev: int
    c_out_cell: int           # channels after concat
    h_in: int                 # resolution of preprocessed states
    h_out: int                # resolution of new states (h_in // 2 in reduce cells)
    steps: int
    mult: int


def stem_resolution(b: ArchBucket) -> int:
    s = b.image_size
    if b.is_vit:
        patch = 16 if b.is_imagenet_input else 3
        return _conv_out(s, patch, patch, int(patch < 4))
    if b.stem_type == 0:
        h = _conv_out(s, b.ks, b.imagenet_stride if b.is_imagenet_input else 1, b.ks // 2)
        if b.stem_pool:
            h = _conv_out(h, 3, 2, 1)
        return h
    st = 2 if b.is_imagenet_input else 1
    h = _conv_out(s, b.ks, st, b.ks // 2)
    h = _conv_out(h, 3, st, 1)          # stem0 second conv
    return h                             # resolution of s0; s1 is one stride-2 conv below


def cell_geometry(b: ArchBucket) -> List[CellGeom]:
    """Mirror of Network.__init__'s channel/resolution bookkeeping (nets/darts.py)."""
    c_prev_prev = c_prev = c_curr = b.C
    if b.stem_type == 0:
        c_stem = int(b.C * (3 if (b.preproc and not b.is_imagenet_input) else 1))
        c_prev_prev = c_prev = c_stem
    h0 = stem_resolution(b)
    if b.stem_type == 1:
        r0, r1 = h0, _conv_out(h0, 3, 2, 1)   # stem1 conv
    else:
        r0 = r1 = h0

    def is_red(ci):
        return ci in (b.n_cells // 3, 2 * b.n_cells // 3) and ci > 0

    geoms = []
    reduction_prev = b.stem_type == 1
    for ci in range(b.n_cells):
        reduction = is_red(ci)
        if reduction:
            c_curr *= b.C_mult
        steps = b.steps_reduce if reduction else b.steps_normal
        mult = b.mult_reduce if reduction else b.mult_normal
        red_spatial = reduction and not b.is_vit
        h_out = (r1 + 1) // 2 if red_spatial else r1
        geoms.append(CellGeom(cell=ci, reduction=reduction, reduction_prev=reduction_prev,
                              c=c_curr, c_prev_prev=c_prev_prev, c_prev=c_prev,
                              c_out_cell=mult * c_curr, h_in=r1, h_out=h_out,
                              steps=steps, mult=mult))
        reduction_prev = reduction
        c_prev_prev, c_prev = c_prev, mult * c_curr
        r0, r1 = r1, h_out
    return geoms


def head_features(b: ArchBucket, geoms: Sequence[CellGeom]) -> int:
    c_prev = geoms[-1].c_out_cell if geoms else b.C
    if b.glob_avg:
        return c_prev
    s = (7 if (b.stem_type == 1 or b.stem_pool) else 14) if b.is_imagenet_input \
        else (4 if (b.stem_type == 1 or b.stem_pool) else 8)
    return c_prev * s * s


# ---------------------------------------------------------------------------
# Parameter specs: canonical (kind, name-suffix, shape) list per op — the shared
# contract between host encoding (name -> graph node) and device decode order.
# Module indices follow the reference Sequential layouts, where bn_layer occupies
# a slot even when norm is None (Identity) — ops.py:183-238.
# ---------------------------------------------------------------------------

def op_param_specs(base: str, k: int, c_in: int, c_out: int,
                   has_norm: bool) -> List[Tuple[str, str, Tuple[int, ...]]]:
    if base in ('none', 'skip_connect', 'avg_pool', 'max_pool'):
        return []
    if base == 'skip_reduce':         # FactorizedReduce (strided skip_connect)
        specs = [('w4d', 'conv_1.weight', (c_out // 2, c_in, 1, 1)),
                 ('w4d', 'conv_2.weight', (c_out // 2, c_in, 1, 1))]
        if has_norm:
            specs.append(('pair', 'bn.weight', (c_out,)))
        return specs
    if base == 'conv':
        specs = [('w4d', 'op.1.weight', (c_out, c_in, k, k))]
        if has_norm:
            specs.append(('pair', 'op.2.weight', (c_out,)))
        return specs
    if base == 'conv2':
        specs = [('w4d', 'op.1.weight', (c_in, c_in, 1, k)),
                 ('w4d', 'op.2.weight', (c_out, c_in, k, 1))]
        if has_norm:
            specs.append(('pair', 'op.3.weight', (c_out,)))
        return specs
    if base == 'sep_conv':
        specs = [('w4d', 'op.1.weight', (c_in, 1, k, k)),
                 ('w4d', 'op.2.weight', (c_in, c_in, 1, 1))]
        if has_norm:
            specs.append(('pair', 'op.3.weight', (c_in,)))
        specs += [('w4d', 'op.5.weight', (c_in, 1, k, k)),
                  ('w4d', 'op.6.weight', (c_out, c_in, 1, 1))]
        if has_norm:
            specs.append(('pair', 'op.7.weight', (c_out,)))
        return specs
    if base == 'dil_conv':
        specs = [('w4d', 'op.1.weight', (c_in, 1, k, k)),
                 ('w4d', 'op.2.weight', (c_out, c_in, 1, 1))]
        if has_norm:
            specs.append(('pair', 'op.3.weight', (c_out,)))
        return specs
    if base == 'msa':
        d = c_in
        return [('pair', 'ln1.weight', (d,)),
                ('w2d', 'attn.to_qkv.weight', (3 * d, d)),
                ('w2d', 'attn.to_out.0.weight', (d, d)),
                ('bias', 'attn.to_out.0.bias', (d,)),
                ('pair', 'ln2.weight', (d,)),
                ('w2d', 'ff.net.0.weight', (d, d)),
                ('bias', 'ff.net.0.bias', (d,)),
                ('w2d', 'ff.net.3.weight', (d, d)),
                ('bias', 'ff.net.3.bias', (d,))]
    if base == 'cse':
        d = c_in
        return [('w2d', 'fc1.weight', (d // 2, d)), ('bias', 'fc1.bias', (d // 2,)),
                ('w2d', 'fc2.weight', (d, d // 2)), ('bias', 'fc2.bias', (d,))]
    raise NotImplementedError(base)


# ---------------------------------------------------------------------------
# Device-side decode fetchers (traceable; reuse the plan path's exact numerics)
# ---------------------------------------------------------------------------

def _frob(w) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2))


def _saved(t):
    """Tag a decoded tensor for the remat policy: decoded weights are
    parameter-sized (small), so the trainer saves them across the fwd/bwd
    boundary and rematerializes only activations
    (jax.checkpoint_policies.save_only_these_names('ghn_decoded'))."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(t, 'ghn_decoded')


class _Fetcher:
    """Decode context closed over by every branch: GHN params + node embeddings.
    Accumulated Frobenius norms implement predparam_wd (reference trainer.py:288-294).
    When cfg.dtype is bfloat16 the decoded weights are cast for the target-net
    compute (reference AMP autocasts GHN and target forwards together,
    trainer.py:298-346); decode itself and norm statistics stay f32.
    """

    def __init__(self, params, cfg: GHNConfig, x_flat, weight_norm: bool,
                 z_fc=None, z_1d=None):
        self.params = params
        self.cfg = cfg
        self.x_flat = x_flat
        self.weight_norm = weight_norm
        self.unit_var = bool(getattr(cfg, 'unit_var_norm', False))
        self.compute_dtype = jnp.dtype(cfg.dtype)
        if z_fc is not None:
            # precomputed hoists (the grouped executor vmaps them over the
            # meta-batch once and builds per-net fetchers from the slices)
            self.z_fc, self.z_1d = z_fc, z_1d
            return
        # shared decode stages hoisted over ALL nodes: one MXU-sized matmul each
        # instead of a per-slot matvec inside every branch (same numerics —
        # rows of a batched matmul)
        from ..models.ghn_core import decode_1d, decode_conv_fc
        from ..predict import _precision
        with jax.default_matmul_precision(_precision(cfg)):
            self.z_fc = decode_conv_fc(params, cfg, x_flat)   # (N, hid4, s, s)
            self.z_1d = decode_1d(params, x_flat)             # (N, 2*max_ch)

    def cast(self, w):
        return w.astype(self.compute_dtype)

    def _emb(self, node_id):
        return jax.lax.dynamic_index_in_dim(self.x_flat, node_id, axis=0, keepdims=True)

    def _zfc(self, node_id):
        return jax.lax.dynamic_index_in_dim(self.z_fc, node_id, axis=0, keepdims=True)

    def _z1d(self, node_id):
        return jax.lax.dynamic_index_in_dim(self.z_1d, node_id, axis=0,
                                            keepdims=False).reshape(2, -1)

    def w(self, node_id, sz: Tuple[int, ...]):
        """4d/2d weight: conv decode -> tile -> fan-in normalize. Returns (w, frob)."""
        from ..predict import decode_group
        key = decode_key(sz, self.cfg.max_shape, False, False)
        w = decode_group(self.params, self.cfg, key, None, z=self._zfc(node_id))[0]
        w = tile_params(w, sz, corner=self.cfg.is_ghn2)
        if self.weight_norm:
            w = normalize_params(w, True, unit_var=self.unit_var)
        return _saved(self.cast(w)), _frob(w)

    def pair(self, node_id, sz: Tuple[int, ...]):
        """Norm weight/bias channel pair from one node (rows 0/1 of decode_1d)."""
        z = self._z1d(node_id)
        w = tile_params(z[0], sz)
        b = tile_params(z[1], sz)
        if self.weight_norm:
            w = normalize_params(w, True, unit_var=self.unit_var)
            b = normalize_params(b, False, unit_var=self.unit_var)
        return _saved(w), _saved(b), _frob(w) + _frob(b)

    def bias(self, node_id, sz: Tuple[int, ...]):
        z = self._z1d(node_id)
        b = tile_params(z[1], sz)
        if self.weight_norm:
            b = normalize_params(b, False, unit_var=self.unit_var)
        return _saved(self.cast(b)), _frob(b)

    def cls_w(self, node_id, sz: Tuple[int, int]):
        """Final classification weight (class_layer_predictor head)."""
        from ..predict import decode_group
        key = decode_key(sz, self.cfg.max_shape, True, False)
        w = decode_group(self.params, self.cfg, key, None, z=self._zfc(node_id))[0]
        w = tile_params(w, sz, corner=self.cfg.is_ghn2)
        if self.weight_norm:
            w = normalize_params(w, True, unit_var=self.unit_var)
        return _saved(w), _frob(w)

    def cls_b(self, node_id, sz: Tuple[int]):
        from ..models.ghn_core import decode_bias_class
        b = decode_bias_class(self.params, self._z1d(node_id)[None])[0][1]
        b = tile_params(b, sz)
        if self.weight_norm:
            b = normalize_params(b, False, unit_var=self.unit_var)
        return _saved(b), _frob(b)

    # -- width-folded fetchers -------------------------------------------
    # Decode at the PADDED key (one decode program per bucket), then expand to
    # the padded tensor with the TRUE-width cyclic tiling and zero rows/cols
    # beyond the true dims. Exactness: every decode is a slice of the full
    # (max0, max1) block (ghn_core.decode_conv; reference nn.py:736-760), and
    # tile_params is cyclic with base block min(true, decoded) — reproduced
    # here with traced moduli. Masked-out channels stay exactly zero through
    # the whole target net (conv/BN/pool/relu of zeros is zero), so folded
    # logits equal the exact-width program's.

    def _tile_dyn(self, w, pad0, pad1, t0, t1):
        s0, s1 = w.shape[0], w.shape[1]
        m0 = jnp.minimum(t0, s0)
        m1 = jnp.minimum(t1, s1)
        r = jnp.arange(pad0, dtype=jnp.int32)
        c = jnp.arange(pad1, dtype=jnp.int32)
        wp = jnp.take(jnp.take(w, jnp.mod(r, m0), axis=0), jnp.mod(c, m1), axis=1)
        mask = (r[:, None] < t0) & (c[None, :] < t1)
        return wp * mask.reshape(mask.shape + (1,) * (w.ndim - 2)).astype(w.dtype)

    def _tile_dyn_1d(self, z, pad, t):
        m = jnp.minimum(t, z.shape[0])
        i = jnp.arange(pad, dtype=jnp.int32)
        return jnp.take(z, jnp.mod(i, m), axis=0) * (i < t).astype(z.dtype)

    def w_dyn(self, node_id, pad_sz: Tuple[int, ...], t0, t1, fan_in_true):
        """Folded 4d/2d weight: decode at padded key, dynamic tile+mask,
        fan-in normalize with the TRUE fan-in (reference nn.py:583)."""
        from ..predict import decode_group
        key = decode_key(tuple(pad_sz), self.cfg.max_shape, False, False)
        w = decode_group(self.params, self.cfg, key, None, z=self._zfc(node_id))[0]
        w = self._tile_dyn(w, pad_sz[0], pad_sz[1], t0, t1)
        if len(pad_sz) == 2:
            w = w.reshape(pad_sz)
        if self.weight_norm:
            no_relu = len(pad_sz) > 2 and (pad_sz[1] == 1 or pad_sz[2] < pad_sz[3])
            beta = 1.0 if no_relu else 2.0
            w = w * jnp.sqrt(beta / jnp.maximum(1, fan_in_true).astype(jnp.float32))
        return _saved(self.cast(w)), _frob(w)

    def pair_dyn(self, node_id, pad: int, t):
        z = self._z1d(node_id)
        w = self._tile_dyn_1d(z[0], pad, t)
        b = self._tile_dyn_1d(z[1], pad, t)
        if self.weight_norm:
            w = normalize_params(w, True, unit_var=self.unit_var)
            b = normalize_params(b, False, unit_var=self.unit_var)
            # masked channels must stay exactly zero (2*sigmoid(0) = 1)
            live = (jnp.arange(pad) < t).astype(w.dtype)
            w = w * live
            b = b * live
        return _saved(w), _saved(b), _frob(w) + _frob(b)

    def bias_dyn(self, node_id, pad: int, t):
        z = self._z1d(node_id)
        b = self._tile_dyn_1d(z[1], pad, t)
        if self.weight_norm:
            b = normalize_params(b, False, unit_var=self.unit_var)
            b = b * (jnp.arange(pad) < t).astype(b.dtype)
        return _saved(self.cast(b)), _frob(b)

    def cls_w_dyn(self, node_id, pad_sz: Tuple[int, int], t_in, fan_in_true):
        """Folded classification weight: class decode columns are in-dim slices
        (the class head contracts the out axis per column, ghn_core.decode_conv)."""
        from ..predict import decode_group
        key = decode_key(tuple(pad_sz), self.cfg.max_shape, True, False)
        w = decode_group(self.params, self.cfg, key, None, z=self._zfc(node_id))[0]
        m = jnp.minimum(t_in, w.shape[1])
        c = jnp.arange(pad_sz[1], dtype=jnp.int32)
        w = jnp.take(w, jnp.mod(c, m), axis=1) * (c < t_in).astype(w.dtype)[None, :]
        if self.weight_norm:
            w = w * jnp.sqrt(2.0 / jnp.maximum(1, fan_in_true).astype(jnp.float32))
        return _saved(w), _frob(w)

    def fetch_specs_dyn(self, node_ids, specs, true_dims):
        """Folded fetch_specs: ``true_dims[i]`` is (t_out, t_in, fan_in_true)
        per spec (traced scalars), or None to use the static path for that spec."""
        out, total = [], 0.0
        for i, (kind, _name, sz) in enumerate(specs):
            nid = node_ids[i]
            dyn = true_dims[i]
            if kind == 'pair':
                if dyn is None:
                    w, b, f = self.pair(nid, sz)
                else:
                    w, b, f = self.pair_dyn(nid, sz[0], dyn[0])
                out += [w, b]
            elif kind == 'bias':
                if dyn is None:
                    b, f = self.bias(nid, sz)
                else:
                    b, f = self.bias_dyn(nid, sz[0], dyn[0])
                out.append(b)
            else:
                if dyn is None:
                    w, f = self.w(nid, sz)
                else:
                    w, f = self.w_dyn(nid, sz, dyn[0], dyn[1], dyn[2])
                out.append(w)
            total = total + f
        return out, total

    def fetch_specs(self, node_ids, specs):
        """Decode a spec list; returns (tensors in spec order, total frobenius).
        ``pair`` specs contribute two tensors (weight, bias). Decoded tensors
        are tagged for the remat policy: they are parameter-sized (small), so
        the trainer saves them across the fwd/bwd boundary and rematerializes
        only activations (jax.checkpoint_policies.save_only_these_names)."""
        out, total = [], 0.0
        for i, (kind, _name, sz) in enumerate(specs):
            nid = node_ids[i]
            if kind == 'pair':
                w, b, f = self.pair(nid, sz)
                out += [w, b]
            elif kind == 'bias':
                b, f = self.bias(nid, sz)
                out.append(b)
            else:
                w, f = self.w(nid, sz)
                out.append(w)
            total = total + f
        return out, total


# ---------------------------------------------------------------------------
# Primitive apply helpers. Internal layout is NHWC: channels ride the 128-lane
# axis of the TPU (CIFAR-sized W in NCHW wastes up to 4x on lane padding).
# Numerics equal the NCHW nets/functional.py path (tests/test_interpreter.py);
# decoded weights stay OIHW (XLA transposes once inside the conv).
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, padding=0, dilation=1, groups=1):
    s = (stride, stride) if isinstance(stride, int) else stride
    p = [(padding, padding), (padding, padding)] if isinstance(padding, int) \
        else [(padding[0], padding[0]), (padding[1], padding[1])]
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    return jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=p, rhs_dilation=d,
        feature_group_count=groups, dimension_numbers=('NHWC', 'OIHW', 'NHWC'))


def _bn(x, w, b, eps=1e-5):
    # norm statistics in f32 even under bf16 compute (torch-AMP semantics)
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(0, 1, 2), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(0, 1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * w[None, None, None, :] + b[None, None, None, :]
    return y.astype(x.dtype)


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _pool_counts(h: int, w: int, stride: int, k: int = 3) -> np.ndarray:
    """Static count_include_pad=False divisor for a kxk/pad-k//2 window (NHWC)."""
    pad = k // 2
    ones = np.ones((h, w), np.float32)
    out_h, out_w = _conv_out(h, k, stride, pad), _conv_out(w, k, stride, pad)
    counts = np.zeros((1, out_h, out_w, 1), np.float32)
    padded = np.pad(ones, ((pad, pad), (pad, pad)))
    for i in range(out_h):
        for j in range(out_w):
            counts[0, i, j, 0] = padded[i * stride:i * stride + k,
                                        j * stride:j * stride + k].sum()
    return counts


def _pool(x, kind, stride, k: int = 3):
    pad = k // 2
    dims, strides = (1, k, k, 1), (1, stride, stride, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if kind == 'max':
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, pads)
    summed = jax.lax.reduce_window(x, x.dtype.type(0), jax.lax.add, dims, strides, pads)
    # count_include_pad=False (OPS avg_pool, ops.py:336); divisor is static
    return summed / jnp.asarray(_pool_counts(x.shape[1], x.shape[2], stride, k), x.dtype)


def _compact_channels(y, n_seg: int, seg_pad: int, seg_true, live_total=None):
    """Re-pack a channel concat of ``n_seg`` padded segments (each ``seg_pad``
    wide, live prefix ``seg_true``) into a single live prefix, zeroing the tail.
    ``live_total`` (default n_seg*seg_true) caps the live region when only the
    first mult_true segments are real (steps/mult folding). Keeps the
    width-folded invariant that every state's live channels are a prefix, so
    downstream weights need only rectangular masks."""
    p = jnp.arange(n_seg * seg_pad, dtype=jnp.int32)
    st = jnp.maximum(seg_true, 1)
    src = jnp.clip((p // st) * seg_pad + jnp.mod(p, st), 0, n_seg * seg_pad - 1)
    out = jnp.take(y, src, axis=-1)
    if live_total is None:
        live_total = n_seg * seg_true
    return out * (p < live_total).astype(y.dtype)


@dataclasses.dataclass
class CellTrue:
    """Traced true-width counterparts of CellGeom's channel fields (width
    folding). Every state keeps its live channels as a prefix (concats are
    re-packed by :func:`_compact_channels`), so these scalars are all a
    consumer needs."""
    c: object
    c_prev_prev: object
    c_prev: object
    c_out_cell: object


def true_widths(b: ArchBucket, geoms: Sequence[CellGeom], c_true, mult_true=None):
    """Per-cell true channel counts as traced scalars, mirroring
    cell_geometry's bookkeeping on the padded side. ``mult_true`` is the
    per-cell true concat length ((n_cells,) data under steps/mult folding;
    None uses the static geom.mult)."""
    c_stem_mult = 3 if (b.stem_type == 0 and b.preproc and not b.is_imagenet_input) else 1
    c_pp = c_p = c_true * (c_stem_mult if b.stem_type == 0 else 1)
    c_curr = c_true
    out = []
    for g in geoms:
        if g.reduction:
            c_curr = c_curr * b.C_mult
        m = g.mult if mult_true is None else mult_true[g.cell]
        out.append(CellTrue(c=c_curr, c_prev_prev=c_pp, c_prev=c_p,
                            c_out_cell=m * c_curr))
        c_pp, c_p = c_p, m * c_curr
    return out


def op_true_dims(base: str, k: int, c_t, has_norm: bool):
    """True (t_out, t_in, fan_in) triples — or (t,) for pair/bias rows —
    aligned with :func:`op_param_specs` rows, given the true channel count
    ``c_t`` (a traced scalar). Width folding only (msa lives in ViT nets,
    which keep exact widths)."""
    if base in ('none', 'skip_connect', 'avg_pool', 'max_pool'):
        return []
    kk = k * k
    if base == 'skip_reduce':
        dims = [(c_t // 2, c_t, c_t), (c_t // 2, c_t, c_t)]
        if has_norm:
            dims.append((c_t,))
        return dims
    if base == 'conv':
        dims = [(c_t, c_t, c_t * kk)]
        if has_norm:
            dims.append((c_t,))
        return dims
    if base == 'conv2':
        dims = [(c_t, c_t, c_t * k), (c_t, c_t, c_t * k)]
        if has_norm:
            dims.append((c_t,))
        return dims
    if base == 'sep_conv':
        dims = [(c_t, 1, kk), (c_t, c_t, c_t)]
        if has_norm:
            dims.append((c_t,))
        dims += [(c_t, 1, kk), (c_t, c_t, c_t)]
        if has_norm:
            dims.append((c_t,))
        return dims
    if base == 'dil_conv':
        dims = [(c_t, 1, kk), (c_t, c_t, c_t)]
        if has_norm:
            dims.append((c_t,))
        return dims
    if base == 'cse':
        return [(c_t // 2, c_t, c_t), (c_t // 2,),
                (c_t, c_t // 2, c_t // 2), (c_t,)]
    raise NotImplementedError(f'width folding does not support {base!r}')


# ---------------------------------------------------------------------------
# Branch builders
# ---------------------------------------------------------------------------

def _make_branch(fe: _Fetcher, base: str, k: int, strided: bool, c: int,
                 has_norm: bool, heads: int = 8, c_t=None):
    """One lax.switch branch: (x_hi, x_lo, node_ids) -> (y_lo, predwd).
    Strided branches read x_hi (pre-reduction resolution), others x_lo.
    ``c_t`` (traced scalar) enables width-folded execution: weights are
    fetched via the dynamic tile+mask path and concats re-packed to a live
    prefix."""
    stride = 2 if strided else 1
    spec_base = 'skip_reduce' if (base == 'skip_connect' and strided) else base
    specs = op_param_specs(spec_base, k, c, c, has_norm)

    def fetch(node_ids):
        if c_t is None:
            return fe.fetch_specs(node_ids, specs)
        return fe.fetch_specs_dyn(node_ids, specs,
                                  op_true_dims(spec_base, k, c_t, has_norm))

    def maybe_bn(y, t, i):
        return _bn(y, t[i], t[i + 1]) if has_norm else y

    def branch(x_hi, x_lo, node_ids):
        x = x_hi if strided else x_lo
        if base == 'none':
            y = (x[:, ::2, ::2, :] if strided else x) * 0.0
            return y, jnp.float32(0.0)
        if base == 'skip_connect':
            if not strided:
                return x, jnp.float32(0.0)
            t, f = fetch(node_ids)
            xr = jax.nn.relu(x)
            y1 = _conv(xr, t[0], stride=2)
            y2 = _conv(xr[:, 1:, 1:, :], t[1], stride=2)
            y = jnp.concatenate([y1, y2], axis=-1)
            if c_t is not None:
                y = _compact_channels(y, 2, c // 2, c_t // 2)
            return maybe_bn(y, t, 2), f
        if base in ('avg_pool', 'max_pool'):
            return _pool(x, base[:3], stride, k), jnp.float32(0.0)
        t, f = fetch(node_ids)
        if base == 'conv':
            y = _conv(jax.nn.relu(x), t[0], stride=stride, padding=k // 2)
            return maybe_bn(y, t, 1), f
        if base == 'conv2':
            y = _conv(jax.nn.relu(x), t[0], stride=(1, stride), padding=(0, k // 2))
            y = _conv(y, t[1], stride=(stride, 1), padding=(k // 2, 0))
            return maybe_bn(y, t, 2), f
        if base == 'sep_conv':
            i = 0
            y = _conv(jax.nn.relu(x), t[0], stride=stride, padding=k // 2, groups=c)
            y = _conv(y, t[1])
            i = 2
            if has_norm:
                y = _bn(y, t[2], t[3])
                i = 4
            y = _conv(jax.nn.relu(y), t[i], stride=1, padding=k // 2, groups=c)
            y = _conv(y, t[i + 1])
            if has_norm:
                y = _bn(y, t[i + 2], t[i + 3])
            return y, f
        if base == 'dil_conv':
            y = _conv(jax.nn.relu(x), t[0], stride=stride, padding=k - k % 2,
                      dilation=2, groups=c)
            y = _conv(y, t[1])
            return maybe_bn(y, t, 2), f
        if base == 'cse':
            s = x.mean(axis=(1, 2))
            s = s @ t[0].T + t[1]
            s = jax.nn.relu(s) @ t[2].T + t[3]
            s = jax.nn.hard_swish(s)
            y = x * s[:, None, None, :]
            return (y[:, ::2, ::2, :] if strided else y), f
        if base == 'msa':
            # TransformerLayer (nets/darts.py:127-184): pre-LN attn + FF, mlp_ratio 1
            bsz, hh, ww, ch = x.shape
            tok = x.reshape(bsz, hh * ww, ch)
            ln1w, ln1b, qkv, outw, outb, ln2w, ln2b, f0w, f0b, f3w, f3b = t
            yn = _ln(tok, ln1w, ln1b)
            n = hh * ww
            d = ch // heads
            q_k_v = (yn @ qkv.T).reshape(bsz, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
            q, kk, v = q_k_v[0], q_k_v[1], q_k_v[2]
            attn = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm', q, kk) * (d ** -0.5), -1)
            att = jnp.einsum('bhnm,bhmd->bhnd', attn, v).transpose(0, 2, 1, 3).reshape(bsz, n, ch)
            tok = tok + (att @ outw.T + outb)
            yn = _ln(tok, ln2w, ln2b)
            ff = jax.nn.gelu(yn @ f0w.T + f0b, approximate=False) @ f3w.T + f3b
            tok = tok + ff
            y = tok.reshape(bsz, hh, ww, ch)
            return (y[:, ::2, ::2, :] if strided else y), f
        raise NotImplementedError(base)

    return branch


def _branch_tables(fe: _Fetcher, bucket: ArchBucket, c: int, c_t=None):
    """(normal_branches, reduce_branches) for channel width ``c`` (padded width
    when ``c_t`` carries the true width). Reduce tables append the strided
    variants at offset len(vocab)."""
    normal = [
        _make_branch(fe, base, k, False, c, bucket.has_norm, c_t=c_t)
        for base, k in bucket.vocab]
    if bucket.is_vit:
        return normal, normal
    reduce_tbl = normal + [
        _make_branch(fe, base, k, True, c, bucket.has_norm, c_t=c_t)
        for base, k in bucket.vocab]
    return normal, reduce_tbl


# ---------------------------------------------------------------------------
# Interpreter forward
# ---------------------------------------------------------------------------

def _relu_conv_bn_1x1(fe: _Fetcher, x, node_ids, c_in: int, c_out: int, has_norm: bool,
                      ci_t=None, co_t=None):
    """Cell preprocessing ReLUConvBN (ks=1). ``ci_t``/``co_t`` carry true
    widths under width folding."""
    if ci_t is None:
        w, f = fe.w(node_ids[0], (c_out, c_in, 1, 1))
    else:
        w, f = fe.w_dyn(node_ids[0], (c_out, c_in, 1, 1), co_t, ci_t, ci_t)
    y = _conv(jax.nn.relu(x), w)
    if has_norm:
        if ci_t is None:
            bw, bb, f2 = fe.pair(node_ids[1], (c_out,))
        else:
            bw, bb, f2 = fe.pair_dyn(node_ids[1], c_out, co_t)
        y = _bn(y, bw, bb)
        f = f + f2
    return y, f


def _factorized_reduce(fe: _Fetcher, x, node_ids, c_in: int, c_out: int, has_norm: bool,
                       ci_t=None, co_t=None):
    if ci_t is None:
        w1, f1 = fe.w(node_ids[0], (c_out // 2, c_in, 1, 1))
        w2, f2 = fe.w(node_ids[1], (c_out // 2, c_in, 1, 1))
    else:
        w1, f1 = fe.w_dyn(node_ids[0], (c_out // 2, c_in, 1, 1), co_t // 2, ci_t, ci_t)
        w2, f2 = fe.w_dyn(node_ids[1], (c_out // 2, c_in, 1, 1), co_t // 2, ci_t, ci_t)
    xr = jax.nn.relu(x)
    y = jnp.concatenate([_conv(xr, w1, stride=2),
                         _conv(xr[:, 1:, 1:, :], w2, stride=2)], axis=-1)
    if ci_t is not None:
        y = _compact_channels(y, 2, c_out // 2, co_t // 2)
    f = f1 + f2
    if has_norm:
        if ci_t is None:
            bw, bb, f3 = fe.pair(node_ids[2], (c_out,))
        else:
            bw, bb, f3 = fe.pair_dyn(node_ids[2], c_out, co_t)
        y = _bn(y, bw, bb)
        f = f + f3
    return y, f


def _run_stem(fe: _Fetcher, bucket: ArchBucket, stem_nodes, images, c_t=None):
    """images arrive NCHW (the public layout); everything after is NHWC.
    Returns (s0, s1, predwd). ``c_t`` = true base width under folding."""
    b = bucket
    images = images.transpose(0, 2, 3, 1)

    def w4(nid, pad_sz, t0, t1, fan):
        if c_t is None:
            return fe.w(nid, pad_sz)
        return fe.w_dyn(nid, pad_sz, t0, t1, fan)

    def pr(nid, pad, t):
        if c_t is None:
            return fe.pair(nid, (pad,))
        return fe.pair_dyn(nid, pad, t)

    if b.is_vit:
        patch = 16 if b.is_imagenet_input else 3
        w, f1 = fe.w(stem_nodes[0], (b.C, 3, patch, patch))
        y = _conv(images, w, stride=patch, padding=int(patch < 4))
        pe_k = 14 if b.is_imagenet_input else 11
        pe, f2 = fe.w(stem_nodes[1], (1, b.C, pe_k, pe_k))
        y = y + pe.transpose(0, 2, 3, 1)
        return y, y, f1 + f2
    if b.stem_type == 0:
        mul = 3 if (b.preproc and not b.is_imagenet_input) else 1
        c_stem = int(b.C * mul)
        w, f = w4(stem_nodes[0], (c_stem, 3, b.ks, b.ks),
                  None if c_t is None else c_t * mul, 3, 3 * b.ks * b.ks)
        y = _conv(images, w, stride=b.imagenet_stride if b.is_imagenet_input else 1,
                  padding=b.ks // 2)
        if b.has_norm:
            bw, bb, f2 = pr(stem_nodes[1], c_stem, None if c_t is None else c_t * mul)
            y = _bn(y, bw, bb)
            f = f + f2
        if b.stem_pool:
            y = _pool(y, 'max', 2)
        return y, y, f
    # stem_type 1 (ImageNet stem, nets/darts.py:355-366)
    st = 2 if b.is_imagenet_input else 1
    half = None if c_t is None else c_t // 2
    w, f = w4(stem_nodes[0], (b.C // 2, 3, b.ks, b.ks), half, 3, 3 * b.ks * b.ks)
    y = _conv(images, w, stride=st, padding=b.ks // 2)
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes[1], b.C // 2, half)
        y = _bn(y, bw, bb)
        f = f + f2
    y = jax.nn.relu(y)
    w, f2 = w4(stem_nodes[2], (b.C, b.C // 2, 3, 3), c_t, half,
               None if c_t is None else half * 9)
    y = _conv(y, w, stride=st, padding=1)
    f = f + f2
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes[3], b.C, c_t)
        y = _bn(y, bw, bb)
        f = f + f2
    s0 = y
    w, f2 = w4(stem_nodes[4], (b.C, b.C, 3, 3), c_t, c_t,
               None if c_t is None else c_t * 9)
    y = _conv(jax.nn.relu(s0), w, stride=2, padding=1)
    f = f + f2
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes[5], b.C, c_t)
        y = _bn(y, bw, bb)
        f = f + f2
    return s0, y, f


def _run_cell(fe: _Fetcher, bucket: ArchBucket, geom: CellGeom, arch, s0, s1,
              ct: Optional[CellTrue] = None):
    """Execute one cell; returns (out, predwd). ``ct`` = true widths (folding)."""
    ci = geom.cell
    predwd = jnp.float32(0.0)
    vit = bucket.is_vit
    pre = arch['pre_nodes'][ci]

    if bucket.preproc:
        if geom.reduction_prev and not vit:
            p0, f = _factorized_reduce(fe, s0, pre[0:3], geom.c_prev_prev, geom.c,
                                       bucket.has_norm,
                                       ci_t=None if ct is None else ct.c_prev_prev,
                                       co_t=None if ct is None else ct.c)
        else:
            p0, f = _relu_conv_bn_1x1(fe, s0, pre[0:2], geom.c_prev_prev, geom.c,
                                      bucket.has_norm,
                                      ci_t=None if ct is None else ct.c_prev_prev,
                                      co_t=None if ct is None else ct.c)
        predwd = predwd + f
        p1, f = _relu_conv_bn_1x1(fe, s1, pre[3:5], geom.c_prev, geom.c, bucket.has_norm,
                                  ci_t=None if ct is None else ct.c_prev,
                                  co_t=None if ct is None else ct.c)
        predwd = predwd + f
    else:
        p0 = s0[:, ::2, ::2, :] if (geom.reduction_prev and not vit) else s0
        p1 = s1

    normal_tbl, reduce_tbl = _branch_tables(fe, bucket, geom.c,
                                            c_t=None if ct is None else ct.c)
    n_slots = 2 * geom.steps
    slot_op = arch['slot_op'][ci, :n_slots].reshape(geom.steps, 2)
    slot_src = arch['slot_src'][ci, :n_slots].reshape(geom.steps, 2)
    slot_nodes = arch['slot_nodes'][ci, :n_slots].reshape(geom.steps, 2, MAX_SLOT_NODES)

    bsz = p0.shape[0]
    red_spatial = geom.reduction and not vit

    if red_spatial:
        hi = jnp.stack([p0, p1])                                   # (2, B, H, W, C)
        lo0 = jnp.zeros((geom.steps, bsz, geom.h_out, geom.h_out, geom.c), p0.dtype)

        def body(carry, xs):
            lo, acc = carry
            ops, srcs, nds, i = xs

            def one(j):
                x_hi = jax.lax.dynamic_index_in_dim(hi, jnp.clip(srcs[j], 0, 1), 0, False)
                x_lo = jax.lax.dynamic_index_in_dim(
                    lo, jnp.clip(srcs[j] - 2, 0, geom.steps - 1), 0, False)
                return jax.lax.switch(ops[j], reduce_tbl, x_hi, x_lo, nds[j])

            ya, fa = one(0)
            yb, fb = one(1)
            lo = jax.lax.dynamic_update_index_in_dim(lo, ya + yb, i, 0)
            return (lo, acc + fa + fb), None

        idx = jnp.arange(geom.steps, dtype=jnp.int32)
        (lo, f), _ = jax.lax.scan(body, (lo0, jnp.float32(0.0)),
                                  (slot_op, slot_src, slot_nodes, idx),
                                  unroll=_scan_unroll())
        predwd = predwd + f
        cat = jnp.take(lo, jnp.clip(arch['concat'][ci, :geom.mult] - 2, 0,
                                    geom.steps - 1), axis=0)
    else:
        bank0 = jnp.zeros((geom.steps + 2, bsz, geom.h_in, geom.h_in, geom.c), p0.dtype)
        bank0 = bank0.at[0].set(p0).at[1].set(p1)

        def body(carry, xs):
            bank, acc = carry
            ops, srcs, nds, i = xs

            def one(j):
                x = jax.lax.dynamic_index_in_dim(bank, srcs[j], 0, False)
                return jax.lax.switch(ops[j], normal_tbl, x, x, nds[j])

            ya, fa = one(0)
            yb, fb = one(1)
            bank = jax.lax.dynamic_update_index_in_dim(bank, ya + yb, i + 2, 0)
            return (bank, acc + fa + fb), None

        idx = jnp.arange(geom.steps, dtype=jnp.int32)
        (bank, f), _ = jax.lax.scan(body, (bank0, jnp.float32(0.0)),
                                    (slot_op, slot_src, slot_nodes, idx),
                                    unroll=_scan_unroll())
        predwd = predwd + f
        cat = jnp.take(bank, jnp.clip(arch['concat'][ci, :geom.mult], 0,
                                      geom.steps + 1), axis=0)

    # (mult, B, H, W, C) -> channel concat in concat-index order
    out = cat.transpose(1, 2, 3, 0, 4).reshape(bsz, cat.shape[2], cat.shape[3],
                                               geom.mult * geom.c)
    if ct is not None:
        # re-pack live channel prefixes of the mult segments into one prefix
        # (c_out_cell = mult_true * c_true caps the live region when concat
        # segments are padded)
        out = _compact_channels(out, geom.mult, geom.c, ct.c,
                                live_total=ct.c_out_cell)
    return out, predwd


class BufferFetcher(_Fetcher):
    """Reads target-net parameters from a flat packed buffer instead of
    decoding them from GHN node embeddings.

    This evaluates ARBITRARY parameter values — He init, fine-tuned weights,
    a predicted-parameter view — through the same bucket program shape the
    interpreter compiles, so a whole eval arm (e.g. the randinit baseline of
    the learning proof, reference ghn3_results.json `randinit-*` columns)
    rides ONE compiled program per bucket with the architecture AND the
    parameter values as data, instead of one XLA program per architecture.

    Layout contract (produced by :func:`pack_net_params`): each param-bearing
    graph node owns a contiguous slice starting at ``node_off[node]`` holding
    its tensor at the PADDED program shape (norm nodes: weight then bias,
    each padded), true values at the leading corner and exact zeros beyond —
    identical to what the width-folded decode path's masking computes, so the
    folded program is reproduced bit-for-bit from stored values.
    """

    def __init__(self, cfg: GHNConfig, buffer, node_off):
        self.params = None
        self.cfg = cfg
        self.x_flat = None
        self.weight_norm = False     # stored values are final
        self.unit_var = False
        self.compute_dtype = jnp.dtype(cfg.dtype)
        self.buffer = buffer
        self.node_off = node_off

    def _read(self, node_id, numel: int):
        off = jax.lax.dynamic_index_in_dim(self.node_off, node_id, 0,
                                           keepdims=False)
        return jax.lax.dynamic_slice(self.buffer, (off,), (numel,))

    # static-shape fetchers ------------------------------------------------
    def w(self, node_id, sz):
        w = self._read(node_id, int(np.prod(sz))).reshape(sz)
        return _saved(self.cast(w)), _frob(w)

    def pair(self, node_id, sz):
        z = self._read(node_id, 2 * int(sz[0])).reshape(2, int(sz[0]))
        return _saved(z[0]), _saved(z[1]), _frob(z[0]) + _frob(z[1])

    def bias(self, node_id, sz):
        b = self._read(node_id, int(sz[0]))
        return _saved(self.cast(b)), _frob(b)

    cls_w = w
    cls_b = bias

    # width-folded fetchers: the buffer already holds the padded, masked
    # layout, so the true-dim arguments are ignored ------------------------
    def w_dyn(self, node_id, pad_sz, t0, t1, fan_in_true):
        return self.w(node_id, tuple(pad_sz))

    def pair_dyn(self, node_id, pad, t):
        return self.pair(node_id, (int(pad),))

    def bias_dyn(self, node_id, pad, t):
        return self.bias(node_id, (int(pad),))

    def cls_w_dyn(self, node_id, pad_sz, t_in, fan_in_true):
        return self.w(node_id, tuple(pad_sz))


def max_fetch_elems(bucket: ArchBucket) -> int:
    """Largest single buffer read ANY branch of the bucket's program can issue.

    lax.switch traces every branch, and dynamic_slice sizes are static — so a
    BufferFetcher's buffer must be at least this long even when the genotype
    never selects the big-read branches. pack callers pad buffers up to this."""
    geoms = cell_geometry(bucket)
    mx = 1

    def upd(specs):
        nonlocal mx
        for kind, _n, sz in specs:
            n = int(np.prod(sz))
            mx = max(mx, 2 * n if kind == 'pair' else n)

    for sz in target_param_shapes(bucket).values():
        n = int(np.prod(sz))
        mx = max(mx, 2 * n if len(sz) == 1 else n)
    for c in {g.c for g in geoms}:
        for base, k in bucket.vocab:
            if base == 'skip_connect' and not bucket.is_vit:
                upd(op_param_specs('skip_reduce', k, c, c, bucket.has_norm))
            upd(op_param_specs(base, k, c, c, bucket.has_norm))
    feat = head_features(bucket, geoms)
    dims = ([feat] + [bucket.fc_dim] * max(0, bucket.fc_layers - 1)
            + [bucket.num_classes]) if bucket.fc_layers > 1 \
        else [feat, bucket.num_classes]
    for i in range(len(dims) - 1):
        mx = max(mx, dims[i] * dims[i + 1])
    return mx


_PARAM_OPS = ('conv', 'sep_conv', 'dil_conv', 'bn', 'ln', 'bias', 'pos_enc')


def pack_net_params(graph: GraphDef, bucket: ArchBucket,
                    params: Dict[str, np.ndarray],
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: lay a name->tensor dict out as the (node_off, buffer) pair a
    :class:`BufferFetcher` reads.

    Padded program shapes come from the same tables the encoder uses
    (:func:`target_param_shapes` + :func:`fill_slot_shapes` on the folded
    bucket); true tensors are embedded at the leading corner with exact zeros
    beyond — the masked layout the width-folded decode path computes. Works
    because the folded program keeps all live data in leading channel
    prefixes everywhere (cell outputs are compacted), and flatten heads are
    channel-major so true classifier columns are a leading prefix too.

    :param params: name -> array at TRUE shapes (e.g. evaluate.he_init_params
        output, or a predicted PackedParams view converted to a dict).
    :return: (node_off int32 [n_nodes], buffer float32 [L], spec) where spec is
        a list of (name, offset, pad_shape, true_shape) rows —
        :func:`unpack_net_params` inverts the layout with it (e.g. to read
        fine-tuned values back out of an optimized buffer).
    """
    assert graph.net_args is not None and 'genotype' in graph.net_args
    shapes_pad = fill_slot_shapes(bucket, graph.net_args['genotype'],
                                  target_param_shapes(bucket))

    def embed(a, pad_sz) -> np.ndarray:
        a = np.asarray(a, np.float32)
        pad_sz = tuple(int(v) for v in pad_sz)
        if a.shape == pad_sz:
            return a.ravel()
        if len(a.shape) != len(pad_sz) or any(
                s > p for s, p in zip(a.shape, pad_sz)):
            raise ValueError(f'true shape {a.shape} does not embed in padded '
                             f'{pad_sz}')
        out = np.zeros(pad_sz, np.float32)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out.ravel()

    offs = np.zeros((graph.n_nodes,), np.int32)
    chunks: List[np.ndarray] = []
    spec: List[Tuple[str, int, Tuple[int, ...], Tuple[int, ...]]] = []
    cur = 0
    for cell_rows in graph.node_info:
        for row in cell_rows:
            name = row.param_name
            if not name or row.op not in _PARAM_OPS:
                continue
            if name not in shapes_pad:
                raise KeyError(f'no padded program shape for {name!r}')
            pad_sz = shapes_pad[name]
            if row.op in ('bn', 'ln'):
                b_name = name[:-len('.weight')] + '.bias'
                vec = np.concatenate([embed(params[name], (pad_sz[0],)),
                                      embed(params[b_name], (pad_sz[0],))])
                spec.append((name, cur, (int(pad_sz[0]),),
                             tuple(np.shape(params[name]))))
                spec.append((b_name, cur + int(pad_sz[0]), (int(pad_sz[0]),),
                             tuple(np.shape(params[b_name]))))
            else:
                vec = embed(params[name], pad_sz)
                spec.append((name, cur, tuple(int(v) for v in pad_sz),
                             tuple(np.shape(params[name]))))
            offs[row.node_ind] = cur
            chunks.append(vec)
            cur += vec.size
    buffer = (np.concatenate(chunks) if chunks
              else np.zeros((1,), np.float32))
    return offs, buffer, spec


def unpack_net_params(spec, buffer: np.ndarray) -> Dict[str, np.ndarray]:
    """Invert :func:`pack_net_params`: crop each tensor's true-shape leading
    corner back out of a (possibly optimized) flat buffer."""
    buffer = np.asarray(buffer)
    out: Dict[str, np.ndarray] = {}
    for name, off, pad_sz, true_sz in spec:
        t = buffer[off:off + int(np.prod(pad_sz))].reshape(pad_sz)
        out[name] = t[tuple(slice(0, s) for s in true_sz)]
    return out


def interpret_forward(params, cfg: GHNConfig, bucket: ArchBucket,
                      x_flat: jnp.ndarray, arch: Dict[str, jnp.ndarray],
                      images: jnp.ndarray,
                      weight_norm: Optional[bool] = None,
                      fetcher: Optional[_Fetcher] = None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + execute one architecture in a single traceable program.

    :param x_flat: (N_pad, hid) graphormer node embeddings of this net's graph
        (unused when ``fetcher`` is given).
    :param arch: integer arch-data arrays from :func:`encode_arch`.
    :param fetcher: optional parameter source overriding the GHN decode —
        e.g. a :class:`BufferFetcher` evaluating stored parameter values.
    :return: (logits (B, num_classes), predwd scalar = sum of Frobenius norms).
    """
    weight_norm = cfg.weight_norm if weight_norm is None else weight_norm
    fe = fetcher if fetcher is not None else _Fetcher(params, cfg, x_flat,
                                                      weight_norm)
    geoms = cell_geometry(bucket)

    folded = bucket.c_folded or bucket.fc_folded or bucket.sm_folded
    if folded:
        c_true = arch['c_true']
        fc_true = arch['fc_true'] if bucket.fc_dim else 0
        cts = true_widths(bucket, geoms, c_true,
                          mult_true=arch['mult_true'] if bucket.sm_folded else None)
    else:
        cts = [None] * len(geoms)

    images = images.astype(fe.compute_dtype)
    s0, s1, predwd = _run_stem(fe, bucket, arch['stem_nodes'], images,
                               c_t=c_true if folded else None)
    for geom, ct in zip(geoms, cts):
        out, f = _run_cell(fe, bucket, geom, arch, s0, s1, ct=ct)
        predwd = predwd + f
        s0, s1 = s1, out

    if bucket.glob_avg:
        x = s1.mean(axis=(1, 2))
    else:
        # flatten in NCHW order (the classifier weight layout the GHN predicts)
        x = s1.transpose(0, 3, 1, 2).reshape(s1.shape[0], -1)
    x = x.astype(jnp.float32)

    feat = head_features(bucket, geoms)
    dims = [feat] + [bucket.fc_dim] * max(0, bucket.fc_layers - 1) + [bucket.num_classes] \
        if bucket.fc_layers > 1 else [feat, bucket.num_classes]
    if folded:
        feat_t = cts[-1].c_out_cell if geoms else c_true
        if not bucket.glob_avg:
            feat_t = feat_t * (feat // (geoms[-1].c_out_cell if geoms else bucket.C))
        dims_t = [feat_t] + [fc_true] * max(0, bucket.fc_layers - 1) \
            + [bucket.num_classes] if bucket.fc_layers > 1 \
            else [feat_t, bucket.num_classes]
    cls = arch['cls_nodes']
    for li in range(len(dims) - 1):
        last = li == len(dims) - 2
        if last:
            if folded:
                w, fw = fe.cls_w_dyn(cls[2 * li], (dims[li + 1], dims[li]),
                                     dims_t[li], dims_t[li])
            else:
                w, fw = fe.cls_w(cls[2 * li], (dims[li + 1], dims[li]))
            b, fb = fe.cls_b(cls[2 * li + 1], (dims[li + 1],))
        else:
            if folded:
                w, fw = fe.w_dyn(cls[2 * li], (dims[li + 1], dims[li]),
                                 dims_t[li + 1], dims_t[li], dims_t[li])
                b, fb = fe.bias_dyn(cls[2 * li + 1], dims[li + 1], dims_t[li + 1])
            else:
                w, fw = fe.w(cls[2 * li], (dims[li + 1], dims[li]))
                b, fb = fe.bias(cls[2 * li + 1], (dims[li + 1],))
        predwd = predwd + fw + fb
        x = x @ w.T + b
        if not last:
            x = jax.nn.relu(x)
    return x, predwd


# ---------------------------------------------------------------------------
# Host-side arch encoding
# ---------------------------------------------------------------------------

class EncodeError(ValueError):
    pass


def bucket_of(net_args: dict, num_classes: int, is_imagenet_input: bool,
              vocab: Tuple[Tuple[str, int], ...] = DEFAULT_VOCAB,
              input_size: int = 0, fold_widths: bool = True) -> ArchBucket:
    """Static bucket key from DeepNets-1M ``net_args`` (cheap; no graph needed).

    With ``fold_widths`` (default), C and fc_dim are padded up to WIDTH_CLASSES /
    FC_CLASSES so same-class nets share one program (exact numerics; see the
    module comment). Folding is UNIFORM: every non-ViT net runs the folded
    (dynamic-width) program, including nets already at their pad class — that
    keeps boundary nets from splitting program keys, at the cost that
    fixed-width benchmarks also measure the folded program, not the pre-folding
    static one. ViT nets (stem_type 2) keep exact widths: their per-head
    attention reshapes are width-static (documented limitation)."""
    g: Genotype = net_args['genotype']
    is_vit = any(n[0] == 'msa' for n in g.normal + g.reduce)
    norm = net_args.get('norm', 'bn')
    c_true = int(net_args['C'])
    fc_layers = int(net_args.get('fc_layers', 1) or 1)
    # fc_dim is canonically 0 when there is no hidden classifier layer (it is
    # unused then and must not split program keys)
    fc_true = int(net_args.get('fc_dim', 0) or 0) if fc_layers > 1 else 0
    sn, sr = len(g.normal) // 2, len(g.reduce) // 2
    mn, mr = len(g.normal_concat), len(g.reduce_concat)
    c_prog, fc_prog = c_true, fc_true
    sn_p, sr_p, mn_p, mr_p = sn, sr, mn, mr
    c_folded = fc_folded = sm_folded = False
    if fold_widths and not is_vit:
        # any net that uses msa is ViT-classified (above), so non-ViT folded
        # programs can PRUNE msa from their op vocabulary: the folded branch
        # builders do not implement msa (attention head reshapes are
        # width-static) and no op id can reference it.  Keeps mixed
        # CNN+ViT dataset streams foldable (the fixture/DeepNets vocab
        # carries msa for its ViT nets).
        vocab = tuple(e for e in vocab if e[0] != 'msa')
        # folding is UNIFORM: a net already at its pad class still runs the
        # folded program (masks are no-ops), so boundary nets don't split keys
        c_prog = pad_class(c_true, WIDTH_CLASSES)
        c_folded = True
        if fc_true:
            fc_prog = pad_class(fc_true, FC_CLASSES)
            fc_folded = True
        sn_p = pad_class(sn, STEP_CLASSES)
        sr_p = pad_class(sr, STEP_CLASSES)
        if bool(net_args.get('preproc', True)):
            mn_p = pad_class(mn, MULT_CLASSES)
            mr_p = pad_class(mr, MULT_CLASSES)
        # preproc=False nets require c_out_cell == c (states feed ops raw), so
        # their concat length stays exact (padded slots still run 'none')
        sm_folded = True
    return ArchBucket(
        C=c_prog, n_cells=int(net_args['n_cells']),
        steps_normal=sn_p, steps_reduce=sr_p,
        mult_normal=mn_p, mult_reduce=mr_p,
        stem_type=2 if is_vit else int(net_args.get('stem_type', 0)),
        stem_pool=bool(net_args.get('stem_pool', False)),
        preproc=bool(net_args.get('preproc', True)),
        C_mult=int(net_args.get('C_mult', 1)),
        has_norm=norm not in (None, '', 'none'),
        ks=int(net_args.get('ks', 3)),
        glob_avg=bool(net_args.get('glob_avg', True)),
        fc_layers=fc_layers,
        fc_dim=fc_prog,
        num_classes=int(num_classes),
        is_imagenet_input=bool(is_imagenet_input),
        imagenet_stride=int(net_args.get('imagenet_stride', 4)),
        input_size=int(input_size),
        vocab=tuple(vocab),
        c_folded=c_folded, fc_folded=fc_folded, sm_folded=sm_folded)


def _vocab_id(vocab, base: str, k: int) -> int:
    try:
        return vocab.index((base, k))
    except ValueError:
        raise EncodeError(f'op ({base}, {k}) not in interpreter vocabulary')


def encode_arch(graph: GraphDef, num_classes: int = 10,
                is_imagenet_input: bool = False,
                vocab: Tuple[Tuple[str, int], ...] = DEFAULT_VOCAB,
                cfg: Optional[GHNConfig] = None,
                input_size: int = 0,
                ) -> Tuple[ArchBucket, Dict[str, np.ndarray]]:
    """Genotype graph -> (bucket, arch-data arrays).

    The returned ``arch`` dict contains int32 arrays (plus ``shape_ind``) shaped by
    the bucket only — stack arrays of same-bucket nets for the batched executor.
    Every parameter-bearing graph node must be consumed exactly once (validated),
    mirroring the reference debug_level>=1 coverage check (nn.py:354-397).
    """
    net_args = graph.net_args
    assert net_args is not None and 'genotype' in net_args, 'genotype net_args required'
    b = bucket_of(net_args, num_classes, is_imagenet_input, vocab, input_size)
    vocab = b.vocab   # folded non-ViT buckets prune msa; ids must match
    if not b.glob_avg and b.image_size not in (224, 32):
        # flatten-head feature size is pinned by the fixed table shared with the
        # reference Network (ops.py:497-500); nonstandard input sizes mismatch it
        raise EncodeError(f'glob_avg=False nets require 224/32 inputs, '
                          f'got {b.image_size}')
    geno: Genotype = net_args['genotype']
    geoms = cell_geometry(b)

    # name -> node index from node_info (the graph's param-node registry)
    name2node: Dict[str, int] = {}
    param_rows = []
    for cell_rows in graph.node_info:
        for row in cell_rows:
            param_rows.append(row)
            if row.param_name and row.op in ('conv', 'sep_conv', 'dil_conv', 'bn',
                                             'ln', 'bias', 'pos_enc'):
                name2node[row.param_name] = row.node_ind

    used = set()

    def node_for(name: str) -> int:
        if name not in name2node:
            # graphs store norm-pair and bias info on the weight node
            raise EncodeError(f'param node not found: {name!r} '
                              f'(have e.g. {sorted(name2node)[:8]})')
        used.add(name)
        return name2node[name]

    n_cells, max_slots, max_mult = b.n_cells, b.max_slots, b.max_mult
    arch = {
        'stem_nodes': np.zeros((6,), np.int32),
        'pre_nodes': np.zeros((n_cells, 5), np.int32),
        'slot_op': np.zeros((n_cells, max_slots), np.int32),
        'slot_src': np.zeros((n_cells, max_slots), np.int32),
        'slot_nodes': np.zeros((n_cells, max_slots, MAX_SLOT_NODES), np.int32),
        'concat': np.zeros((n_cells, max_mult), np.int32),
        'cls_nodes': np.zeros((2 * max(1, b.fc_layers),), np.int32),
    }
    none_id = _vocab_id(vocab, 'none', 3)
    arch['slot_op'][:] = none_id
    mult_true = np.zeros((n_cells,), np.int32)

    # ---- stem ----
    if b.is_vit:
        arch['stem_nodes'][0] = node_for('stem0.weight')
        arch['stem_nodes'][1] = node_for('pos_enc.weight')
    elif b.stem_type == 0:
        arch['stem_nodes'][0] = node_for('stem.0.weight')
        if b.has_norm:
            arch['stem_nodes'][1] = node_for('stem.1.weight')
    else:
        # Sequential indices are constant (bn slots hold Identity when norm=None)
        names = ['stem0.0.weight'] + (['stem0.1.weight'] if b.has_norm else ['']) \
            + ['stem0.3.weight'] + (['stem0.4.weight'] if b.has_norm else ['']) \
            + ['stem1.1.weight'] + (['stem1.2.weight'] if b.has_norm else [''])
        for j, nm in enumerate(names):
            if nm:
                arch['stem_nodes'][j] = node_for(nm)

    # ---- cells ----
    for geom in geoms:
        ci = geom.cell
        if b.preproc:
            pre0 = f'cells.{ci}.preprocess0'
            if geom.reduction_prev and not b.is_vit:
                arch['pre_nodes'][ci, 0] = node_for(f'{pre0}.conv_1.weight')
                arch['pre_nodes'][ci, 1] = node_for(f'{pre0}.conv_2.weight')
                if b.has_norm:
                    arch['pre_nodes'][ci, 2] = node_for(f'{pre0}.bn.weight')
            else:
                arch['pre_nodes'][ci, 0] = node_for(f'{pre0}.op.1.weight')
                if b.has_norm:
                    arch['pre_nodes'][ci, 1] = node_for(f'{pre0}.op.2.weight')
            arch['pre_nodes'][ci, 3] = node_for(f'cells.{ci}.preprocess1.op.1.weight')
            if b.has_norm:
                arch['pre_nodes'][ci, 4] = node_for(f'cells.{ci}.preprocess1.op.2.weight')

        pairs = geno.reduce if geom.reduction else geno.normal
        concat = geno.reduce_concat if geom.reduction else geno.normal_concat
        valid = [True, True]          # states 0,1 (preprocessed inputs)
        # geom.steps may be PADDED (sm folding); only true slots carry ops —
        # padded slots keep their 'none' prefill and are never concatenated
        for i in range(len(pairs) // 2):
            outs_valid = []
            for jj, j in enumerate((2 * i, 2 * i + 1)):
                op_name, src = pairs[j]
                base, k = parse_op_ks(op_name)
                src = int(src)
                strided = geom.reduction and src < 2 and not b.is_vit
                dead = base == 'none' or not valid[src]
                slot = 2 * i + jj
                arch['slot_src'][ci, slot] = src
                if dead:
                    # strided none (reads hi, subsamples) when the source would be
                    # a hi-res state of a reduce cell; plain none (reads lo) else
                    arch['slot_op'][ci, slot] = none_id + (len(vocab) if strided else 0)
                    outs_valid.append(False)
                    continue
                vid = _vocab_id(vocab, base, k)
                arch['slot_op'][ci, slot] = vid + (len(vocab) if strided else 0)
                prefix = f'cells.{ci}._ops.{j}'
                spec_base = 'skip_reduce' if (base == 'skip_connect' and strided) else base
                specs = op_param_specs(spec_base, k, geom.c, geom.c, b.has_norm)
                assert len(specs) <= MAX_SLOT_NODES, (base, len(specs))
                for si, (_kind, suffix, _sz) in enumerate(specs):
                    arch['slot_nodes'][ci, 2 * i + jj, si] = node_for(f'{prefix}.{suffix}')
                outs_valid.append(True)
            valid.append(outs_valid[0] or outs_valid[1])

        concat_l = list(concat)
        if len(concat_l) > geom.mult:
            raise EncodeError(f'concat length mismatch in cell {ci}')
        if geom.reduction and not b.is_vit and any(cc < 2 for cc in concat_l):
            raise EncodeError('reduce-cell concat of an input state mixes resolutions')
        if not any(valid[cc] for cc in concat_l):
            raise EncodeError('invalid network: all concat states are dead')
        mult_true[ci] = len(concat_l)
        # padded concat entries repeat the first index; compaction's live_total
        # (mult_true * c_true) zeroes their segments
        concat_l = concat_l + [concat_l[0]] * (geom.mult - len(concat_l))
        arch['concat'][ci] = np.asarray(concat_l, np.int32)

    # ---- classifier ----
    mod_idx = 0
    for li in range(max(1, b.fc_layers)):
        arch['cls_nodes'][2 * li] = node_for(f'classifier.{mod_idx}.weight')
        arch['cls_nodes'][2 * li + 1] = node_for(f'classifier.{mod_idx}.bias')
        mod_idx += 3      # Linear, ReLU, Dropout

    # ---- coverage check + shape_ind ----
    missing = sorted(set(name2node) - used)
    if missing:
        raise EncodeError(f'graph param nodes not consumed by the interpreter: {missing}')

    if b.c_folded or b.fc_folded or b.sm_folded:
        arch['c_true'] = np.int32(net_args['C'])
        arch['fc_true'] = np.int32(net_args.get('fc_dim', 0) or 0)
        arch['mult_true'] = mult_true

    if cfg is not None:
        arch['shape_ind'] = arch_shape_ind(graph, b, cfg)
    return b, arch


def arch_shape_ind(graph: GraphDef, b: ArchBucket, cfg: GHNConfig) -> np.ndarray:
    """(n_nodes, 4) shape-encoder indices, identical to build_plan's for the same
    net (true target shapes for matched rows, row.sz hints otherwise)."""
    tables = tables_for(cfg)
    if b.c_folded or b.fc_folded or b.sm_folded:
        # the shape encoder sees the net's TRUE widths/mults (folding pads only
        # the compiled program's geometry, never the GHN's inputs)
        na = graph.net_args
        g = na['genotype']
        fc_true = int(na.get('fc_dim', 0) or 0) if b.fc_layers > 1 else 0
        b = dataclasses.replace(b, C=int(na['C']), fc_dim=fc_true,
                                steps_normal=len(g.normal) // 2,
                                steps_reduce=len(g.reduce) // 2,
                                mult_normal=len(g.normal_concat),
                                mult_reduce=len(g.reduce_concat),
                                c_folded=False, fc_folded=False, sm_folded=False)
    shapes = target_param_shapes(b)
    fill_slot_shapes(b, graph.net_args['genotype'], shapes)
    n = graph.n_nodes
    out = np.tile(np.array(tables.dummy_index, np.int32), (n, 1))
    for cell_rows in graph.node_info:
        for row in cell_rows:
            sz = shapes.get(row.param_name)
            if sz is None:
                sz = row.sz
            if sz is not None:
                out[row.node_ind] = tables.shape_index(tuple(sz))
    return out


def target_param_shapes(b: ArchBucket) -> Dict[str, Tuple[int, ...]]:
    """name -> true tensor shape for every predicted parameter of the bucket's
    Network family (norm pairs listed under their .weight name; biases separate).
    Mirrors nets/darts.Network.param_shapes() without building the module tree."""
    geno_free: Dict[str, Tuple[int, ...]] = {}
    geoms = cell_geometry(b)

    def put(name, sz):
        geno_free[name] = tuple(int(v) for v in sz)
        if name.endswith('.weight') and len(sz) == 1:
            geno_free[name[:-7] + '.bias'] = (int(sz[0]),)

    # stem
    if b.is_vit:
        patch = 16 if b.is_imagenet_input else 3
        put('stem0.weight', (b.C, 3, patch, patch))
        pe_k = 14 if b.is_imagenet_input else 11
        put('pos_enc.weight', (1, b.C, pe_k, pe_k))
    elif b.stem_type == 0:
        c_stem = int(b.C * (3 if (b.preproc and not b.is_imagenet_input) else 1))
        put('stem.0.weight', (c_stem, 3, b.ks, b.ks))
        if b.has_norm:
            put('stem.1.weight', (c_stem,))
    else:
        put('stem0.0.weight', (b.C // 2, 3, b.ks, b.ks))
        if b.has_norm:
            put('stem0.1.weight', (b.C // 2,))
        put('stem0.3.weight', (b.C, b.C // 2, 3, 3))
        if b.has_norm:
            put('stem0.4.weight', (b.C,))
        put('stem1.1.weight', (b.C, b.C, 3, 3))
        if b.has_norm:
            put('stem1.2.weight', (b.C,))

    for geom in geoms:
        ci = geom.cell
        if b.preproc:
            if geom.reduction_prev and not b.is_vit:
                put(f'cells.{ci}.preprocess0.conv_1.weight',
                    (geom.c // 2, geom.c_prev_prev, 1, 1))
                put(f'cells.{ci}.preprocess0.conv_2.weight',
                    (geom.c // 2, geom.c_prev_prev, 1, 1))
                if b.has_norm:
                    put(f'cells.{ci}.preprocess0.bn.weight', (geom.c,))
            else:
                put(f'cells.{ci}.preprocess0.op.1.weight',
                    (geom.c, geom.c_prev_prev, 1, 1))
                if b.has_norm:
                    put(f'cells.{ci}.preprocess0.op.2.weight', (geom.c,))
            put(f'cells.{ci}.preprocess1.op.1.weight', (geom.c, geom.c_prev, 1, 1))
            if b.has_norm:
                put(f'cells.{ci}.preprocess1.op.2.weight', (geom.c,))

    return geno_free


def fill_slot_shapes(b: ArchBucket, geno: Genotype, shapes: Dict[str, Tuple[int, ...]]):
    """Extend :func:`target_param_shapes` with per-slot op shapes for ``geno``."""
    geoms = cell_geometry(b)
    for geom in geoms:
        pairs = geno.reduce if geom.reduction else geno.normal
        for j, (op_name, src) in enumerate(pairs):
            base, k = parse_op_ks(op_name)
            if base == 'none':
                continue
            strided = geom.reduction and int(src) < 2 and not b.is_vit
            spec_base = 'skip_reduce' if (base == 'skip_connect' and strided) else base
            for kind, suffix, sz in op_param_specs(spec_base, k, geom.c, geom.c,
                                                   b.has_norm):
                name = f'cells.{geom.cell}._ops.{j}.{suffix}'
                shapes[name] = tuple(int(v) for v in sz)
                if kind == 'pair':
                    shapes[name[:-7] + '.bias'] = (int(sz[0]),)
    # classifier
    feat = head_features(b, geoms)
    dims = [feat] + [b.fc_dim] * max(0, b.fc_layers - 1) + [b.num_classes] \
        if b.fc_layers > 1 else [feat, b.num_classes]
    mod_idx = 0
    for li in range(len(dims) - 1):
        shapes[f'classifier.{mod_idx}.weight'] = (dims[li + 1], dims[li])
        shapes[f'classifier.{mod_idx}.bias'] = (dims[li + 1],)
        mod_idx += 3
    return shapes
