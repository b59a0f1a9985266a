"""Grouped (MoE-style) slot execution for the genotype interpreter.

The scan-path executor (nets/interpreter.py) runs the meta-batch as a
``lax.scan`` over nets, each cell slot dispatching through ``lax.switch``.
Profiling on a real v5e (PARITY.md "Profile breakdown") showed the step is
dominated not by the target-net math (~90 ms of 370 ms) but by conditional
machinery and state-bank data movement: every switch is a compiled
conditional that breaks XLA fusion and materializes its operands, and every
slot moves (B, H, W, C) buffers per net, 8x serially.

This module removes both costs by laying the meta-batch along the CHANNEL
axis — the TPU's 128-wide lane dimension:

* activations are ``(B, H, W, M, C)``: all ``M`` nets advance together, and
  a conv over the flattened ``M*C`` channels with ``feature_group_count=M``
  IS the per-net conv (group g reads net g's channel block and applies net
  g's decoded filters) — one big MXU op instead of M small sequential ones,
  with zero redundant FLOPs;
* ``lax.switch`` disappears: ops are grouped into FAMILIES (dense conv,
  conv2, sep_conv, dil_conv, cse, plus parameter-free skip/pool/none).
  Each family executes once per slot for all nets as a single grouped conv
  chain, and per-net one-hot masks combine the family outputs. Heterogeneous
  kernel sizes within a family ride as data: weights are decoded at the
  family's max kernel and masked to each net's true centered k x k window
  (GHN-2: corner window), which is numerically EXACT because the conv
  decoder's MLP is per-spatial-position (ghn_core.decode_conv: the s x s
  crop commutes with the 1x1 decode tail; crop-of-center-crop == direct
  center crop; and a k_max conv at pad k_max//2 whose kernel is zero outside
  the centered k x k window equals the k conv at pad k//2 — likewise for
  dilation 2 with pad k - k%2, and for conv2's per-axis kernels);
* the cell "state bank" becomes straight-line code: states are a Python
  list, slot inputs are one-hot masked sums over it (exact: 0/1 weights),
  and there is no dynamic-update-slice at all.

The msa family is excluded (per-slot attention at CNN resolutions would be
computed for all nets whether or not they selected it); ViT buckets and
msa-bearing vocabularies fall back to the scan path (grouped_supported).

Numerics match the scan path tensor-for-tensor (tests/test_grouped.py): the
weight fetchers reuse the SAME decode-key/tile/normalize primitives
(interpreter._Fetcher), batch norm over (B, H, W) per channel is per-net by
construction, and the masked combines add exact zeros.

Reference semantics mirrored: ops.py OPS table
(/root/reference/ghn3/ops.py:332-400) and Cell/Network forward
(ops.py:403-576), as restated by nets/interpreter.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GHNConfig
from ..ops.assembly import decode_key
from .interpreter import (
    MAX_SLOT_NODES, ArchBucket, CellGeom, CellTrue, _Fetcher, _compact_channels,
    _frob, _pool_counts, _saved, cell_geometry, head_features, op_param_specs,
    op_true_dims, stem_resolution, true_widths,
)

# op bases a family-grouped program can execute; msa is deliberately absent
_GROUPABLE = ('none', 'skip_connect', 'avg_pool', 'max_pool',
              'conv', 'conv2', 'sep_conv', 'dil_conv', 'cse')


def grouped_supported(bucket: ArchBucket) -> bool:
    """True if this bucket can run on the grouped executor."""
    if bucket.is_vit:
        return False
    return all(base in _GROUPABLE for base, _k in bucket.vocab)


def grouped_preferred(bucket: ArchBucket) -> bool:
    """True when grouped execution is a measured WIN over the scan path.

    Every parameterized family in the vocab executes once per slot for ALL
    nets (masked sum), so the redundancy factor is roughly
    sum(family costs) / mean(selected-op cost).  Measured on a real v5e
    (PARITY.md "Grouped slot execution"): with 3 parameterized families
    (conv + sep_conv + dil_conv, the bench vocab) that redundancy costs more
    than the lax.switch dispatch + state-bank movement it removes — 0.61
    vs 0.58 s/step at meta-bs 8, 1.20 vs scan at meta-bs 16.  Grouped is a
    strict win only when there is at most ONE parameterized family at a
    uniform kernel size: zero redundant FLOPs, and the switch disappears.
    """
    if not grouped_supported(bucket):
        return False
    fams = _families(bucket.vocab)
    return len(fams) <= 1 and all(len(set(f.ks)) == 1 for f in fams)


@dataclasses.dataclass(frozen=True)
class _Family:
    base: str                 # 'conv' | 'conv2' | 'sep_conv' | 'dil_conv' | 'cse'
    kmax: int
    ids: Tuple[int, ...]      # vocab indices belonging to this family
    ks: Tuple[int, ...]       # kernel per id (aligned with ids)


def _families(vocab) -> List[_Family]:
    by_base: Dict[str, List[Tuple[int, int]]] = {}
    for vid, (base, k) in enumerate(vocab):
        if base in ('conv', 'conv2', 'sep_conv', 'dil_conv', 'cse'):
            by_base.setdefault(base, []).append((vid, k))
    return [_Family(base=b, kmax=max(k for _v, k in lst),
                    ids=tuple(v for v, _k in lst), ks=tuple(k for _v, k in lst))
            for b, lst in sorted(by_base.items())]


def _ids_of(vocab, base: str) -> Tuple[int, ...]:
    return tuple(i for i, (b, _k) in enumerate(vocab) if b == base)


def _member(base_op, ids: Tuple[int, ...]):
    """(M,) bool: is each net's (unstrided) op id one of ``ids``."""
    m = jnp.zeros(base_op.shape, bool)
    for i in ids:
        m = m | (base_op == i)
    return m


def _mask5(y, m):
    """Zero net-blocks of y (..., M, C) where mask m (M,) is False (exact)."""
    return y * m.astype(y.dtype)[..., :, None]


def _sel_state(states: Sequence[jnp.ndarray], idx_m) -> jnp.ndarray:
    """Per-net state selection: out[..., n, :] = states[idx_m[n]][..., n, :].
    One-hot masked sum — exact (0/1 weights, adding exact zeros)."""
    out = None
    for s_i, st in enumerate(states):
        t = _mask5(st, idx_m == s_i)
        out = t if out is None else out + t
    return out


# ---------------------------------------------------------------------------
# Grouped primitive ops on (B, H, W, M, C) states
# ---------------------------------------------------------------------------

def _gconv(x5, w, stride=1, padding=0, dilation=1, depthwise=False):
    """Per-net conv: x5 (B,H,W,M,C); w (M,Co,Ci,kh,kw) (Ci=1 when depthwise).
    feature_group_count=M (or M*C) makes group g apply net g's filters to net
    g's channel block — exactly the per-net conv, one fused call."""
    B, H, W, M, C = x5.shape
    _, Co, Ci, kh, kw = w.shape
    s = (stride, stride) if isinstance(stride, int) else stride
    p = [(padding, padding), (padding, padding)] if isinstance(padding, int) \
        else [(padding[0], padding[0]), (padding[1], padding[1])]
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if depthwise:
        wf = w.reshape(M * Co, 1, kh, kw)
        groups = M * C
    else:
        wf = w.reshape(M * Co, Ci, kh, kw)
        groups = M
    y = jax.lax.conv_general_dilated(
        x5.reshape(B, H, W, M * C), wf, window_strides=s, padding=p,
        rhs_dilation=d, feature_group_count=groups,
        dimension_numbers=('NHWC', 'OIHW', 'NHWC'))
    return y.reshape(y.shape[0], y.shape[1], y.shape[2], M, Co)


def _gbn(x5, w_mc, b_mc, eps=1e-5):
    """Per-net BN: stats over (B,H,W) per (net, channel) — identical to the
    scan path's per-net _bn. f32 statistics under bf16 compute."""
    xf = x5.astype(jnp.float32)
    mu = xf.mean(axis=(0, 1, 2), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(0, 1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * w_mc[None, None, None] + b_mc[None, None, None]
    return y.astype(x5.dtype)


def _gpool(x5, kind: str, stride: int, k: int = 3):
    pad = k // 2
    dims, strides = (1, k, k, 1, 1), (1, stride, stride, 1, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0))
    if kind == 'max':
        return jax.lax.reduce_window(x5, -jnp.inf, jax.lax.max, dims, strides, pads)
    summed = jax.lax.reduce_window(x5, x5.dtype.type(0), jax.lax.add,
                                   dims, strides, pads)
    counts = _pool_counts(x5.shape[1], x5.shape[2], stride, k)  # (1,H',W',1)
    return summed / jnp.asarray(counts[..., None], x5.dtype)


def _gcompact(y5, n_seg: int, seg_pad: int, seg_true_m, live_m):
    """Per-net channel compaction (width folding): vmap of
    interpreter._compact_channels over the net axis."""
    f = lambda yn, st, lt: _compact_channels(yn, n_seg, seg_pad, st, lt)
    return jax.vmap(f, in_axes=(3, 0, 0), out_axes=3)(y5, seg_true_m, live_m)


# ---------------------------------------------------------------------------
# Weight fetching: per-net decode vmapped over the meta axis
# ---------------------------------------------------------------------------

def _hoist(params, cfg: GHNConfig, x):
    """Shared decode stages for all nets: x (M, N, hid) -> (z_fc, z_1d)."""
    from ..models.ghn_core import decode_1d, decode_conv_fc
    with jax.default_matmul_precision(
            'highest' if cfg.dtype == 'float32' else 'default'):
        z_fc = jax.vmap(lambda xf: decode_conv_fc(params, cfg, xf))(x)
        z_1d = jax.vmap(lambda xf: decode_1d(params, xf))(x)
    return z_fc, z_1d


def _w_fetch(fe: _Fetcher, nid, pad_sz, t0=None, t1=None, fan=None, k_t=None):
    """Generalized 4d/2d weight fetch (per net, inside vmap).

    Decode at the static ``pad_sz`` key, channel-tile (static, or cyclic
    dynamic when ``t0``/``t1`` are traced true widths), mask the kernel to the
    net's true ``k_t`` window (centered; GHN-2 corner — exact, see module
    docstring), then fan-in normalize with the TRUE fan-in ``fan``."""
    from ..predict import decode_group
    key = decode_key(tuple(pad_sz), fe.cfg.max_shape, False, False)
    w = decode_group(fe.params, fe.cfg, key, None, z=fe._zfc(nid))[0]
    if t0 is None:
        from ..ops.assembly import tile_params
        w = tile_params(w, pad_sz, corner=fe.cfg.is_ghn2)
    else:
        w = fe._tile_dyn(w, pad_sz[0], pad_sz[1], t0, t1)
        if len(pad_sz) == 2:
            w = w.reshape(pad_sz)
    if k_t is not None and len(pad_sz) == 4:
        for ax in (2, 3):
            n = int(pad_sz[ax])
            if n <= 1:
                continue
            i = jnp.arange(n, dtype=jnp.int32)
            if fe.cfg.is_ghn2:
                m = i < k_t
            else:
                m = (i >= n // 2 - k_t // 2) & (i < n // 2 + (k_t + 1) // 2)
            shape = [1] * 4
            shape[ax] = n
            w = w * m.reshape(shape).astype(w.dtype)
            if fe.cfg.is_ghn2:
                # GHN-2 takes the decoded CORNER k x k values, but a k_max
                # conv at pad k_max//2 equals the true k conv at pad k//2
                # only when the kernel occupies the CENTERED window (offset
                # k_max//2 - k//2, plain and dilation-2 alike) — shift the
                # corner values there; wrapped-around lanes are masked zeros
                w = jnp.roll(w, n // 2 - k_t // 2, axis=ax)
    if fe.weight_norm:
        no_relu = len(pad_sz) > 2 and (pad_sz[1] == 1 or pad_sz[2] < pad_sz[3])
        beta = 1.0 if no_relu else 2.0
        if fan is None:
            fan = int(np.prod(pad_sz[1:]))
        w = w * jnp.sqrt(beta / jnp.maximum(
            1, jnp.asarray(fan)).astype(jnp.float32))
    return _saved(fe.cast(w)), _frob(w)


def _family_fetch(fe: _Fetcher, nds, spec_base: str, kmax: int, c: int,
                  has_norm: bool, c_t, k_t):
    """Per-net fetch of one family's tensors in spec order (pair -> 2 tensors).
    ``c_t``/``k_t`` are the net's true width / kernel (traced or int).
    True dims come from interpreter.op_true_dims (shared with the scan path,
    so a new op base cannot put the two executors' fan-in tables out of sync;
    it accepts traced k the same as traced c)."""
    specs = op_param_specs(spec_base, kmax, c, c, has_norm)
    dims = op_true_dims(spec_base, k_t, c_t, has_norm)
    kt_arg = None if (isinstance(k_t, int) and k_t == kmax) else k_t
    out, total = [], jnp.float32(0.0)
    for i, (kind, _name, sz) in enumerate(specs):
        nid = nds[i]
        if kind == 'pair':
            w, b, f = fe.pair_dyn(nid, sz[0], dims[i][0])
            out += [w, b]
        elif kind == 'bias':
            b, f = fe.bias_dyn(nid, sz[0], dims[i][0])
            out.append(b)
        else:
            t0, t1, fan = dims[i]
            w, f = _w_fetch(fe, nid, sz, t0=t0, t1=t1, fan=fan, k_t=kt_arg)
            out.append(w)
        total = total + f
    return tuple(out), total


class GFetcher:
    """Decode context for the grouped executor: per-net hoisted decode stages
    plus a vmap harness building per-net _Fetchers over the meta axis."""

    def __init__(self, params, cfg: GHNConfig, x, weight_norm: bool):
        self.params, self.cfg, self.wn = params, cfg, weight_norm
        self.compute_dtype = jnp.dtype(cfg.dtype)
        self.z_fc, self.z_1d = _hoist(params, cfg, x)   # (M, N, ...) each

    def with_z(self, z_fc, z_1d):
        """Rebind to explicitly-passed hoists (for remat boundaries)."""
        g = object.__new__(GFetcher)
        g.params, g.cfg, g.wn = self.params, self.cfg, self.wn
        g.compute_dtype = self.compute_dtype
        g.z_fc, g.z_1d = z_fc, z_1d
        return g

    def per_net(self, fn, *args, in_axes=None):
        """vmap ``fn(fe, *per_net_args)`` over the meta axis. ``in_axes``
        optionally marks broadcast args (None entries)."""
        def one(z_fc, z_1d, *a):
            fe = _Fetcher(self.params, self.cfg, None, self.wn,
                          z_fc=z_fc, z_1d=z_1d)
            return fn(fe, *a)
        if in_axes is None:
            in_axes = (0,) * len(args)
        axes = (0, 0) + tuple(in_axes)
        return jax.vmap(one, in_axes=axes)(self.z_fc, self.z_1d, *args)

    def family(self, nds_m, spec_base: str, kmax: int, c: int, has_norm: bool,
               c_t_m, k_t_m):
        """Stacked family weights: each tensor (M, ...) + frob (M,)."""
        ax = (0,
              0 if isinstance(c_t_m, (jnp.ndarray, np.ndarray)) else None,
              0 if isinstance(k_t_m, (jnp.ndarray, np.ndarray)) else None)

        def f(fe, nds, c_t, k_t):
            return _family_fetch(fe, nds, spec_base, kmax, c, has_norm, c_t, k_t)
        return self.per_net(f, nds_m, c_t_m, k_t_m, in_axes=ax)


# ---------------------------------------------------------------------------
# Family apply (grouped): weights are stacked (M, ...) in spec order
# ---------------------------------------------------------------------------

def _apply_family(base: str, kmax: int, x5, t, stride: int, c: int,
                  has_norm: bool):
    """One family forward for ALL nets: x5 (B,H,W,M,C) -> (B,H',W',M,C).
    Mirrors interpreter._make_branch's per-family math with grouped convs."""
    def bn(y, i):
        return _gbn(y, t[i], t[i + 1]) if has_norm else y

    if base == 'conv':
        y = _gconv(jax.nn.relu(x5), t[0], stride=stride, padding=kmax // 2)
        return bn(y, 1)
    if base == 'conv2':
        y = _gconv(jax.nn.relu(x5), t[0], stride=(1, stride),
                   padding=(0, kmax // 2))
        y = _gconv(y, t[1], stride=(stride, 1), padding=(kmax // 2, 0))
        return bn(y, 2)
    if base == 'sep_conv':
        y = _gconv(jax.nn.relu(x5), t[0], stride=stride, padding=kmax // 2,
                   depthwise=True)
        y = _gconv(y, t[1])
        i = 2
        if has_norm:
            y = _gbn(y, t[2], t[3])
            i = 4
        y = _gconv(jax.nn.relu(y), t[i], stride=1, padding=kmax // 2,
                   depthwise=True)
        y = _gconv(y, t[i + 1])
        if has_norm:
            y = _gbn(y, t[i + 2], t[i + 3])
        return y
    if base == 'dil_conv':
        y = _gconv(jax.nn.relu(x5), t[0], stride=stride,
                   padding=kmax - kmax % 2, dilation=2, depthwise=True)
        y = _gconv(y, t[1])
        return bn(y, 2)
    if base == 'cse':
        s = x5.mean(axis=(1, 2))                       # (B, M, C)
        s = jnp.einsum('bmc,mdc->bmd', s, t[0]) + t[1][None]
        s = jnp.einsum('bmd,mcd->bmc', jax.nn.relu(s), t[2]) + t[3][None]
        s = jax.nn.hard_swish(s)
        y = x5 * s[:, None, None]
        return y[:, ::2, ::2] if stride == 2 else y
    raise NotImplementedError(base)


def _apply_skip_reduce(x5, t, c: int, has_norm: bool, co_t=None):
    """FactorizedReduce for strided skip_connect (grouped); ``co_t`` = per-net
    true output width under folding ((M,) traced)."""
    xr = jax.nn.relu(x5)
    y1 = _gconv(xr, t[0], stride=2)
    y2 = _gconv(xr[:, 1:, 1:], t[1], stride=2)
    y = jnp.concatenate([y1, y2], axis=-1)             # (B,H',W',M,C)
    if co_t is not None:
        y = _gcompact(y, 2, c // 2, co_t // 2, 2 * (co_t // 2))
    if has_norm:
        y = _gbn(y, t[2], t[3])
    return y


# ---------------------------------------------------------------------------
# Grouped preprocessing / stem / cell
# ---------------------------------------------------------------------------

def _g_relu_conv_bn(gf: GFetcher, x5, nds_m, c_in: int, c_out: int,
                    has_norm: bool, ci_t=None, co_t=None):
    """Grouped ReLUConvBN (1x1). nds_m (M, 2)."""
    arr = isinstance(ci_t, (jnp.ndarray, np.ndarray))
    ax = (0, 0 if arr else None, 0 if arr else None)

    def f(fe, nds, ci, co):
        if ci is None:
            w, fw = fe.w(nds[0], (c_out, c_in, 1, 1))
        else:
            w, fw = fe.w_dyn(nds[0], (c_out, c_in, 1, 1), co, ci, ci)
        if has_norm:
            if ci is None:
                bw, bb, f2 = fe.pair(nds[1], (c_out,))
            else:
                bw, bb, f2 = fe.pair_dyn(nds[1], c_out, co)
            return (w, bw, bb), fw + f2
        return (w,), fw
    t, fr = gf.per_net(f, nds_m, ci_t, co_t, in_axes=ax)
    y = _gconv(jax.nn.relu(x5), t[0])
    if has_norm:
        y = _gbn(y, t[1], t[2])
    return y, fr


def _g_factorized_reduce(gf: GFetcher, x5, nds_m, c_in: int, c_out: int,
                         has_norm: bool, ci_t=None, co_t=None):
    arr = isinstance(ci_t, (jnp.ndarray, np.ndarray))
    ax = (0, 0 if arr else None, 0 if arr else None)

    def f(fe, nds, ci, co):
        if ci is None:
            w1, f1 = fe.w(nds[0], (c_out // 2, c_in, 1, 1))
            w2, f2 = fe.w(nds[1], (c_out // 2, c_in, 1, 1))
        else:
            w1, f1 = fe.w_dyn(nds[0], (c_out // 2, c_in, 1, 1), co // 2, ci, ci)
            w2, f2 = fe.w_dyn(nds[1], (c_out // 2, c_in, 1, 1), co // 2, ci, ci)
        fr = f1 + f2
        if has_norm:
            if ci is None:
                bw, bb, f3 = fe.pair(nds[2], (c_out,))
            else:
                bw, bb, f3 = fe.pair_dyn(nds[2], c_out, co)
            return (w1, w2, bw, bb), fr + f3
        return (w1, w2), fr
    t, fr = gf.per_net(f, nds_m, ci_t, co_t, in_axes=ax)
    xr = jax.nn.relu(x5)
    y = jnp.concatenate([_gconv(xr, t[0], stride=2),
                         _gconv(xr[:, 1:, 1:], t[1], stride=2)], axis=-1)
    if ci_t is not None:
        y = _gcompact(y, 2, c_out // 2, co_t // 2, 2 * (co_t // 2))
    if has_norm:
        y = _gbn(y, t[2], t[3])
    return y, fr


def _g_stem(gf: GFetcher, b: ArchBucket, stem_nodes_m, images, M: int, c_t=None):
    """Grouped stem (stem_type 0/1). images (B,3,H,W) shared across nets."""
    imgs = images.transpose(0, 2, 3, 1).astype(gf.compute_dtype)
    B, H, W, _ = imgs.shape
    img5 = jnp.broadcast_to(imgs[:, :, :, None, :], (B, H, W, M, 3))
    arr = isinstance(c_t, (jnp.ndarray, np.ndarray))

    def _ax(v):
        return 0 if isinstance(v, (jnp.ndarray, np.ndarray)) else None

    def w4(nids, pos, pad_sz, t0, t1, fan):
        def f(fe, nds, tt0, tt1, ff):
            if not arr:
                return fe.w(nds[pos], pad_sz)
            return fe.w_dyn(nds[pos], pad_sz, tt0, tt1, ff)
        return gf.per_net(f, nids, t0, t1, fan,
                          in_axes=(0, _ax(t0), _ax(t1), _ax(fan)))

    def pr(nids, pos, pad, t):
        def f(fe, nds, tt):
            if not arr:
                return fe.pair(nds[pos], (pad,))
            return fe.pair_dyn(nds[pos], pad, tt)
        return gf.per_net(f, nids, t, in_axes=(0, _ax(t)))

    if b.stem_type == 0:
        mul = 3 if (b.preproc and not b.is_imagenet_input) else 1
        c_stem = int(b.C * mul)
        w, fr = w4(stem_nodes_m, 0, (c_stem, 3, b.ks, b.ks),
                   None if c_t is None else c_t * mul, 3, 3 * b.ks * b.ks)
        y = _gconv(img5, w, stride=b.imagenet_stride if b.is_imagenet_input
                   else 1, padding=b.ks // 2)
        if b.has_norm:
            bw, bb, f2 = pr(stem_nodes_m, 1, c_stem,
                            None if c_t is None else c_t * mul)
            y = _gbn(y, bw, bb)
            fr = fr + f2
        if b.stem_pool:
            y = _gpool(y, 'max', 2)
        return y, y, fr
    # stem_type 1 (ImageNet stem)
    st = 2 if b.is_imagenet_input else 1
    half = None if c_t is None else c_t // 2
    w, fr = w4(stem_nodes_m, 0, (b.C // 2, 3, b.ks, b.ks), half, 3,
               3 * b.ks * b.ks)
    y = _gconv(img5, w, stride=st, padding=b.ks // 2)
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes_m, 1, b.C // 2, half)
        y = _gbn(y, bw, bb)
        fr = fr + f2
    y = jax.nn.relu(y)
    w, f2 = w4(stem_nodes_m, 2, (b.C, b.C // 2, 3, 3), c_t, half,
               None if c_t is None else half * 9)
    y = _gconv(y, w, stride=st, padding=1)
    fr = fr + f2
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes_m, 3, b.C, c_t)
        y = _gbn(y, bw, bb)
        fr = fr + f2
    s0 = y
    w, f2 = w4(stem_nodes_m, 4, (b.C, b.C, 3, 3), c_t, c_t,
               None if c_t is None else c_t * 9)
    y = _gconv(jax.nn.relu(s0), w, stride=2, padding=1)
    fr = fr + f2
    if b.has_norm:
        bw, bb, f2 = pr(stem_nodes_m, 5, b.C, c_t)
        y = _gbn(y, bw, bb)
        fr = fr + f2
    return s0, y, fr


def _run_slot(gf: GFetcher, b: ArchBucket, geom: CellGeom, op, nds_m,
              x_lo, x_hi, red: bool, c_t_m, k_tab):
    """Execute one slot position for all nets: masked sum over family outputs.

    :param op: (M,) full op ids (strided = id + |vocab|, reduce cells only).
    :param x_lo: per-net-selected non-strided input (B, h_out, w_out, M, C).
    :param x_hi: per-net-selected strided input (B, h_in, w_in, M, C) or None.
    :return: (y (B,h_out,w_out,M,C), predwd (M,)).
    """
    vocab = b.vocab
    V = len(vocab)
    base_op = op % V
    strided = op >= V
    c = geom.c
    c_t = c_t_m if c_t_m is not None else c
    y = jnp.zeros(x_lo.shape, x_lo.dtype)
    pw = jnp.zeros(op.shape, jnp.float32)

    # parameter-free ops -----------------------------------------------------
    skip_ids = _ids_of(vocab, 'skip_connect')
    if skip_ids:
        m = _member(base_op, skip_ids) & ~strided
        y = y + _mask5(x_lo, m)
    for kind in ('avg_pool', 'max_pool'):
        for vid, (bb, kk) in enumerate(vocab):
            if bb != kind:
                continue
            m = (base_op == vid) & ~strided
            y = y + _mask5(_gpool(x_lo, kind[:3], 1, kk), m)
            if red and x_hi is not None:
                ms = (base_op == vid) & strided
                y = y + _mask5(_gpool(x_hi, kind[:3], 2, kk), ms)

    # strided skip_connect = FactorizedReduce (decoded weights) --------------
    if red and skip_ids and x_hi is not None:
        m = _member(base_op, skip_ids) & strided
        t, fr = gf.family(nds_m, 'skip_reduce', 1, c, b.has_norm, c_t, 1)
        y = y + _mask5(_apply_skip_reduce(x_hi, t, c, b.has_norm,
                                          co_t=None if c_t_m is None
                                          else c_t_m), m)
        pw = pw + fr * m.astype(jnp.float32)

    # parameterized families -------------------------------------------------
    for fam in _families(vocab):
        mem = _member(base_op, fam.ids)
        k_t = fam.kmax if len(set(fam.ks)) == 1 else k_tab[base_op]
        t, fr = gf.family(nds_m, fam.base, fam.kmax, c, b.has_norm, c_t, k_t)
        m_ns = mem & ~strided
        y = y + _mask5(_apply_family(fam.base, fam.kmax, x_lo, t, 1, c,
                                     b.has_norm), m_ns)
        if red and x_hi is not None:
            m_s = mem & strided
            y = y + _mask5(_apply_family(fam.base, fam.kmax, x_hi, t, 2, c,
                                         b.has_norm), m_s)
        pw = pw + fr * mem.astype(jnp.float32)
    return y, pw


def _g_cell(gf: GFetcher, b: ArchBucket, geom: CellGeom, arch, s0, s1,
            ct: Optional[CellTrue], k_tab):
    """One grouped cell. arch leaves are stacked (M, ...)."""
    ci = geom.cell
    M = arch['slot_op'].shape[0]
    pw = jnp.zeros((M,), jnp.float32)
    pre = arch['pre_nodes'][:, ci]                     # (M, 5)

    if b.preproc:
        if geom.reduction_prev:
            p0, f = _g_factorized_reduce(
                gf, s0, pre[:, 0:3], geom.c_prev_prev, geom.c, b.has_norm,
                ci_t=None if ct is None else ct.c_prev_prev,
                co_t=None if ct is None else ct.c)
        else:
            p0, f = _g_relu_conv_bn(
                gf, s0, pre[:, 0:2], geom.c_prev_prev, geom.c, b.has_norm,
                ci_t=None if ct is None else ct.c_prev_prev,
                co_t=None if ct is None else ct.c)
        pw = pw + f
        p1, f = _g_relu_conv_bn(
            gf, s1, pre[:, 3:5], geom.c_prev, geom.c, b.has_norm,
            ci_t=None if ct is None else ct.c_prev,
            co_t=None if ct is None else ct.c)
        pw = pw + f
    else:
        p0 = s0[:, ::2, ::2] if geom.reduction_prev else s0
        p1 = s1

    red = geom.reduction
    c_t_m = None if ct is None else ct.c
    bsz = p0.shape[0]
    if red:
        his = [p0, p1]
        los: List[jnp.ndarray] = [
            jnp.zeros((bsz, geom.h_out, geom.h_out, M, geom.c), p0.dtype)
            for _ in range(geom.steps)]
    else:
        states = [p0, p1] + [
            jnp.zeros((bsz, geom.h_in, geom.h_in, M, geom.c), p0.dtype)
            for _ in range(geom.steps)]

    for i in range(geom.steps):
        y_step = None
        for j in (0, 1):
            slot = 2 * i + j
            op = arch['slot_op'][:, ci, slot]
            src = arch['slot_src'][:, ci, slot]
            nds = arch['slot_nodes'][:, ci, slot]
            if red:
                x_hi = _sel_state(his, jnp.clip(src, 0, 1))
                x_lo = _sel_state(los, jnp.clip(src - 2, 0, geom.steps - 1))
            else:
                x_hi = None
                x_lo = _sel_state(states, src)
            yj, fj = _run_slot(gf, b, geom, op, nds, x_lo, x_hi, red,
                               c_t_m, k_tab)
            y_step = yj if y_step is None else y_step + yj
            pw = pw + fj
        if red:
            los[i] = y_step
        else:
            states[i + 2] = y_step

    if red:
        pool_states = los
        idx = jnp.clip(arch['concat'][:, ci, :geom.mult] - 2, 0, geom.steps - 1)
    else:
        pool_states = states
        idx = jnp.clip(arch['concat'][:, ci, :geom.mult], 0, geom.steps + 1)
    segs = [_sel_state(pool_states, idx[:, q]) for q in range(geom.mult)]
    out = jnp.concatenate(segs, axis=-1)               # (B,H,W,M,mult*C)
    if ct is not None:
        out = _gcompact(out, geom.mult, geom.c, ct.c, ct.c_out_cell)
    return out, pw


def _g_head(gf: GFetcher, b: ArchBucket, geoms, s1, cls_m, folded,
            c_true_m, fc_true_m, cts):
    """Grouped classifier head. s1 (B,H,W,M,C); cls_m (M, 2*fc_layers)."""
    M = s1.shape[3]
    if b.glob_avg:
        x = s1.mean(axis=(1, 2))                       # (B, M, C)
    else:
        # flatten per net in NCHW order (classifier weight layout)
        B, H, W, _, C = s1.shape
        x = s1.transpose(0, 3, 4, 1, 2).reshape(B, M, C * H * W)
    x = x.astype(jnp.float32)

    feat = head_features(b, geoms)
    dims = [feat] + [b.fc_dim] * max(0, b.fc_layers - 1) + [b.num_classes] \
        if b.fc_layers > 1 else [feat, b.num_classes]
    if folded:
        feat_t = cts[-1].c_out_cell if geoms else c_true_m
        if not b.glob_avg:
            feat_t = feat_t * (feat // (geoms[-1].c_out_cell if geoms else b.C))
        dims_t = [feat_t] + [fc_true_m] * max(0, b.fc_layers - 1) \
            + [jnp.full((M,), b.num_classes, jnp.int32)] if b.fc_layers > 1 \
            else [feat_t, jnp.full((M,), b.num_classes, jnp.int32)]
    pw = jnp.zeros((M,), jnp.float32)
    for li in range(len(dims) - 1):
        last = li == len(dims) - 2
        if last:
            if folded:
                def fw_fn(fe, nds, ti):
                    return fe.cls_w_dyn(nds[2 * li], (dims[li + 1], dims[li]),
                                        ti, ti)
                w, fw = gf.per_net(fw_fn, cls_m, dims_t[li])
            else:
                def fw_fn(fe, nds):
                    return fe.cls_w(nds[2 * li], (dims[li + 1], dims[li]))
                w, fw = gf.per_net(fw_fn, cls_m)

            def fb_fn(fe, nds):
                return fe.cls_b(nds[2 * li + 1], (dims[li + 1],))
            bv, fb = gf.per_net(fb_fn, cls_m)
        else:
            if folded:
                def fw_fn(fe, nds, to, ti):
                    return fe.w_dyn(nds[2 * li], (dims[li + 1], dims[li]),
                                    to, ti, ti)

                def fb_fn(fe, nds, to):
                    return fe.bias_dyn(nds[2 * li + 1], dims[li + 1], to)
                w, fw = gf.per_net(fw_fn, cls_m, dims_t[li + 1], dims_t[li])
                bv, fb = gf.per_net(fb_fn, cls_m, dims_t[li + 1])
            else:
                def fw_fn(fe, nds):
                    return fe.w(nds[2 * li], (dims[li + 1], dims[li]))

                def fb_fn(fe, nds):
                    return fe.bias(nds[2 * li + 1], (dims[li + 1],))
                w, fw = gf.per_net(fw_fn, cls_m)
                bv, fb = gf.per_net(fb_fn, cls_m)
        pw = pw + fw + fb
        x = jnp.einsum('bmf,mof->bmo', x, w) + bv[None]
        if not last:
            x = jax.nn.relu(x)
    return x.transpose(1, 0, 2), pw                    # (M, B, classes)


def grouped_forward(params, cfg: GHNConfig, bucket: ArchBucket,
                    x: jnp.ndarray, arch: Dict[str, jnp.ndarray],
                    images: jnp.ndarray,
                    weight_norm: Optional[bool] = None,
                    remat_cells: bool = True,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped meta-batch forward: decode + execute ALL nets of one bucket in
    one conditional-free program.

    :param x: (M, N_pad, hid) graphormer node embeddings (whole meta-batch).
    :param arch: stacked (M, ...) arch-data arrays (build_interp_batch).
    :param images: (B, 3, H, W) shared image batch.
    :return: (logits (M, B, num_classes), predwd (M,)).
    """
    assert grouped_supported(bucket), 'bucket not supported by grouped executor'
    weight_norm = cfg.weight_norm if weight_norm is None else weight_norm
    M = x.shape[0]
    gf = GFetcher(params, cfg, x, weight_norm)
    geoms = cell_geometry(bucket)
    vocab = bucket.vocab
    k_tab = jnp.asarray([k for _b, k in vocab], jnp.int32)

    folded = bucket.c_folded or bucket.fc_folded or bucket.sm_folded
    if folded:
        c_true = arch['c_true']                        # (M,)
        fc_true = arch['fc_true'] if bucket.fc_dim else jnp.zeros((M,), jnp.int32)
        mt = arch['mult_true'].T if bucket.sm_folded else None
        cts = true_widths(bucket, geoms, c_true, mult_true=mt)
    else:
        c_true = fc_true = None
        cts = [None] * len(geoms)

    s0, s1, pw = _g_stem(gf, bucket, arch['stem_nodes'], images, M,
                         c_t=c_true if folded else None)

    def cell_body(z_fc, z_1d, s0, s1, arch_c, ct_tuple, geom=None):
        g2 = gf.with_z(z_fc, z_1d)
        ct = None if ct_tuple is None else CellTrue(*ct_tuple)
        return _g_cell(g2, bucket, geom, arch_c, s0, s1, ct, k_tab)

    for geom, ct in zip(geoms, cts):
        # CellTrue is a plain dataclass (not a pytree); pass its traced fields
        # as a tuple across the remat boundary
        ct_tuple = None if ct is None else (ct.c, ct.c_prev_prev, ct.c_prev,
                                            ct.c_out_cell)
        fn = functools.partial(cell_body, geom=geom)
        if remat_cells:
            fn = jax.checkpoint(fn)
        out, f = fn(gf.z_fc, gf.z_1d, s0, s1, arch, ct_tuple)
        pw = pw + f
        s0, s1 = s1, out

    logits, f = _g_head(gf, bucket, geoms, s1, arch['cls_nodes'], folded,
                        c_true, fc_true, cts)
    return logits, pw + f
