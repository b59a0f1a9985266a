"""GHN-3 hypernetwork: parameter initialization and jittable forward functions.

Pure-functional JAX. Parameters live in a flat ``dict[str, jnp.ndarray]`` whose keys
and layouts equal the reference torch ``state_dict`` (Linear weights are (out, in)),
so checkpoint conversion is a plain tensor copy (/root/reference/ghn3/nn.py:31-125).

TPU-first design notes
----------------------
* Edge-bias restructuring: the reference applies a per-edge MLP to the concatenated
  fwd/bwd distance embeddings over all (i, j) pairs — O(N²·hid²) FLOPs
  (graphormer.py:114-117). Distances are small integers (≤ ve_cutoff + 2), so the
  bias is a pure function of the (d_fwd, d_bwd) pair: we evaluate the MLP once over
  the (T, T) distance table (T ≈ 53) and turn the per-edge work into a gather.
  Numerically identical, asymptotically cheaper.
* Structural embeddings (centrality in/out, input distance) are gathers from
  degree/distance integer tensors computed inside the jit program.
* Everything is static-shape; batches are padded to node-count buckets and masked
  with the reference's AMP-safe -2**15 fill.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GHNConfig
from ..graph.primitives import NUM_PRIMITIVES
from .shape_encoder import tables_for

Params = Dict[str, jnp.ndarray]

MASK_FILL = -2.0 ** 15  # reference graphormer.py:135


# ---------------------------------------------------------------------------
# Initialization (matches torch module defaults + GHN-3 adjustments nn.py:165-172)
# ---------------------------------------------------------------------------

def _linear_init(rng, fan_in: int, fan_out: int, bias: bool = True):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_out, fan_in), jnp.float32, -bound, bound)
    if not bias:
        return w, None
    b = jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def _trunc_normal(rng, shape, std):
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def _sinusoid_table(rows: int, hid: int) -> np.ndarray:
    position = np.arange(rows)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, hid, 2) * (-math.log(10000.0) / hid))
    pe = np.zeros((rows, hid), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    pe[0, :] = 0.0
    return pe.astype(np.float32)


def init_ghn_params(rng, cfg: GHNConfig) -> Params:
    """Random initialization equivalent to the reference construction."""
    tables = tables_for(cfg)
    hid = cfg.hid
    p: Dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(rng, 64 + 8 * cfg.layers))

    def nxt():
        return next(keys)

    embed_std = hid ** -0.5
    p['embed.weight'] = _trunc_normal(nxt(), (NUM_PRIMITIVES, hid), embed_std)
    p['shape_enc.embed_channel.weight'] = _trunc_normal(nxt(), (tables.n_channels + 1, hid // 4), embed_std * 2)
    p['shape_enc.embed_spatial.weight'] = _trunc_normal(nxt(), (tables.n_spatial + 1, hid // 4), embed_std * 2)

    if not cfg.is_ghn2:
        p['centrality_embed_in.weight'] = _trunc_normal(nxt(), (cfg.max_degree + 1, hid), embed_std)
        p['centrality_embed_out.weight'] = _trunc_normal(nxt(), (cfg.max_degree + 1, hid), embed_std)
        p['input_dist_embed.weight'] = _trunc_normal(nxt(), (cfg.max_input_dist + 1, hid), embed_std)

    if cfg.is_ghn2:
        # GatedGNN parameters (experimental GHN-2 path, models/gatedgnn.py)
        for name in ('gnn.mlp.', 'gnn.mlp_ve.'):
            w, b = _linear_init(nxt(), hid, hid)
            p[name + 'fc.0.weight'], p[name + 'fc.0.bias'] = w, b
            w, b = _linear_init(nxt(), hid, hid)
            p[name + 'fc.2.weight'], p[name + 'fc.2.bias'] = w, b
        bound = 1.0 / math.sqrt(hid)
        k = nxt()
        ks = jax.random.split(k, 4)
        p['gnn.gru.weight_ih'] = jax.random.uniform(ks[0], (3 * hid, hid), jnp.float32, -bound, bound)
        p['gnn.gru.weight_hh'] = jax.random.uniform(ks[1], (3 * hid, hid), jnp.float32, -bound, bound)
        p['gnn.gru.bias_ih'] = jax.random.uniform(ks[2], (3 * hid,), jnp.float32, -bound, bound)
        p['gnn.gru.bias_hh'] = jax.random.uniform(ks[3], (3 * hid,), jnp.float32, -bound, bound)

    for i in range(0 if cfg.is_ghn2 else cfg.layers):
        pre = f'gnn.{i}.'
        p[pre + 'ln1.weight'] = jnp.ones((hid,))
        p[pre + 'ln1.bias'] = jnp.zeros((hid,))
        p[pre + 'ln2.weight'] = jnp.ones((hid,))
        p[pre + 'ln2.bias'] = jnp.zeros((hid,))
        w, _ = _linear_init(nxt(), hid, hid * 3, bias=False)
        p[pre + 'attn.to_qkv.weight'] = w
        w, b = _linear_init(nxt(), hid, hid)
        p[pre + 'attn.to_out.0.weight'], p[pre + 'attn.to_out.0.bias'] = w, b
        w, b = _linear_init(nxt(), hid, hid * cfg.mlp_ratio)
        p[pre + 'ff.net.0.weight'], p[pre + 'ff.net.0.bias'] = w, b
        w, b = _linear_init(nxt(), hid * cfg.mlp_ratio, hid)
        p[pre + 'ff.net.3.weight'], p[pre + 'ff.net.3.bias'] = w, b
        if i == 0:
            p[pre + 'attn.edge_embed.embed.weight'] = jnp.asarray(_sinusoid_table(cfg.edge_vocab, hid))
            w, b = _linear_init(nxt(), 2 * hid, hid)
            p[pre + 'attn.proj_e.0.weight'], p[pre + 'attn.proj_e.0.bias'] = w, b
            w, b = _linear_init(nxt(), hid, cfg.heads)
            p[pre + 'attn.proj_e.2.weight'], p[pre + 'attn.proj_e.2.bias'] = w, b

    if cfg.layernorm:
        p['ln.weight'] = jnp.ones((hid,))
        p['ln.bias'] = jnp.zeros((hid,))

    s = cfg.spatial
    hid4, hid8 = hid * 4, hid * 8
    w, b = _linear_init(nxt(), hid, hid4 * s * s)
    p['decoder.fc.0.weight'], p['decoder.fc.0.bias'] = w, b
    w, b = _linear_init(nxt(), hid4, hid8)
    p['decoder.conv.0.weight'], p['decoder.conv.0.bias'] = w, b
    w, b = _linear_init(nxt(), hid8, cfg.max_shape[0] * cfg.max_shape[1])
    p['decoder.conv.2.weight'], p['decoder.conv.2.bias'] = w / 5.0, b * 0  # _init_small
    w, b = _linear_init(nxt(), cfg.max_shape[0], cfg.num_classes)
    p['decoder.class_layer_predictor.1.weight'] = w / 5.0  # _init_small
    p['decoder.class_layer_predictor.1.bias'] = b * 0

    max_ch = cfg.max_ch
    w, b = _linear_init(nxt(), hid, hid * 2)
    p['decoder_1d.fc.0.weight'], p['decoder_1d.fc.0.bias'] = w, b
    w, b = _linear_init(nxt(), hid * 2, 2 * max_ch)
    p['decoder_1d.fc.2.weight'], p['decoder_1d.fc.2.bias'] = w / 5.0, b * 0  # _init_small
    w, b = _linear_init(nxt(), max_ch, cfg.num_classes)
    p['bias_class.1.weight'], p['bias_class.1.bias'] = w, b

    return {k: jnp.asarray(v) for k, v in p.items()}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def edge_bias_table(params: Params, cfg: GHNConfig) -> jnp.ndarray:
    """(T, T, heads) additive attention bias for every (fwd_dist+2, bwd_dist+2) pair."""
    t = min(cfg.edge_vocab, cfg.ve_cutoff + 3)
    emb = params['gnn.0.attn.edge_embed.embed.weight'][:t]           # (T, hid)
    w0 = params['gnn.0.attn.proj_e.0.weight']                        # (hid, 2*hid)
    b0 = params['gnn.0.attn.proj_e.0.bias']
    w1 = params['gnn.0.attn.proj_e.2.weight']                        # (heads, hid)
    b1 = params['gnn.0.attn.proj_e.2.bias']
    hid = cfg.hid
    fwd = emb @ w0[:, :hid].T                                        # (T, hid)
    bwd = emb @ w0[:, hid:].T                                        # (T, hid)
    pre = fwd[:, None, :] + bwd[None, :, :] + b0                     # (T, T, hid)
    return jax.nn.relu(pre) @ w1.T + b1                              # (T, T, heads)


def _use_flash(cfg: GHNConfig, n: int) -> bool:
    if not cfg.flash or n < cfg.flash_min_nodes or n % 8 != 0:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _attention(params: Params, pre: str, x, attn_bias, mask2, cfg: GHNConfig):
    b, n, c = x.shape
    h = cfg.heads
    d = c // h
    qkv = x @ params[pre + 'attn.to_qkv.weight'].T                    # (B, N, 3C)
    qkv = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)         # (3, B, h, N, d)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if _use_flash(cfg, n):
        # fused online-softmax kernel; attn_bias already contains the mask fill
        from ..ops.edge_attention import flash_bias_attention
        y = flash_bias_attention(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                                 v.reshape(b * h, n, d),
                                 attn_bias.reshape(b * h, n, n), d ** -0.5)
        y = y.reshape(b, h, n, d)
    else:
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = attn + attn_bias
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', attn, v, preferred_element_type=jnp.float32)
    y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
    return y @ params[pre + 'attn.to_out.0.weight'].T + params[pre + 'attn.to_out.0.bias']


def _transformer_layer(params: Params, i: int, x, attn_bias, cfg: GHNConfig):
    pre = f'gnn.{i}.'
    h = _layer_norm(x, params[pre + 'ln1.weight'], params[pre + 'ln1.bias'])
    x = x + _attention(params, pre, h, attn_bias, None, cfg)
    h = _layer_norm(x, params[pre + 'ln2.weight'], params[pre + 'ln2.bias'])
    h = h @ params[pre + 'ff.net.0.weight'].T + params[pre + 'ff.net.0.bias']
    h = jax.nn.gelu(h, approximate=False)
    h = h @ params[pre + 'ff.net.3.weight'].T + params[pre + 'ff.net.3.bias']
    return x + h


def ghn_forward(params: Params, cfg: GHNConfig,
                node_op: jnp.ndarray,    # (B, N) int32
                adj: jnp.ndarray,        # (B, N, N) int32 with virtual-edge distances
                shape_ind: jnp.ndarray,  # (B, N, 4) int32
                mask: jnp.ndarray,       # (B, N) bool
                levels: jnp.ndarray = None,  # (B, N) topo levels, GHN-2 only
                ) -> jnp.ndarray:
    """Node embeddings after the propagation stack (+ final LN): (B, N, hid).
    GHN-3: graphormer with edge-biased attention. GHN-2: GatedGNN (experimental,
    models/gatedgnn.py)."""
    ec = params['shape_enc.embed_channel.weight']
    es = params['shape_enc.embed_spatial.weight']
    x = params['embed.weight'][node_op]
    x = x + jnp.concatenate([ec[shape_ind[..., 0]], ec[shape_ind[..., 1]],
                             es[shape_ind[..., 2]], es[shape_ind[..., 3]]], axis=-1)

    if cfg.is_ghn2:
        from .gatedgnn import gated_gnn_forward
        x = gated_gnn_forward(params, cfg, x * mask[..., None], adj, levels, mask)
        if cfg.layernorm:
            x = _layer_norm(x, params['ln.weight'], params['ln.bias'])
        return x

    # structural embeddings (reference graphormer.py:229-235, layer 0 only)
    e1 = (adj == 1)
    indeg = jnp.clip(e1.sum(1), 0, cfg.max_degree)
    outdeg = jnp.clip(e1.sum(2), 0, cfg.max_degree)
    in_dist = jnp.clip(adj[:, 0, :], 0, cfg.max_input_dist)
    x = x + (params['centrality_embed_in.weight'][indeg]
             + params['centrality_embed_out.weight'][outdeg]
             + params['input_dist_embed.weight'][in_dist])
    x = x * mask[..., None]

    # edge-aware attention bias, shared by all layers (reference propagates the
    # layer-0 proj_e output to every subsequent layer)
    t = min(cfg.edge_vocab, cfg.ve_cutoff + 3)
    table = edge_bias_table(params, cfg)                     # (T, T, heads)
    ef = jnp.clip(adj, 0, t - 3) + 2
    eb = jnp.clip(adj.transpose(0, 2, 1), 0, t - 3) + 2
    bias = table[ef, eb]                                     # (B, N, N, heads)
    attn_bias = bias.transpose(0, 3, 1, 2)                   # (B, heads, N, N)

    # fold the padding mask into the shared bias once (reference applies
    # masked_fill(-2**15) per layer; masked logits underflow to 0 after softmax
    # in either formulation)
    mask2 = mask[:, :, None] & mask[:, None, :]
    attn_bias = jnp.where(mask2[:, None], attn_bias, MASK_FILL)

    dtype = jnp.dtype(cfg.dtype)
    if dtype != jnp.float32:
        x = x.astype(dtype)
        attn_bias = attn_bias.astype(dtype)

    for i in range(cfg.layers):
        x = _transformer_layer(params, i, x, attn_bias, cfg)

    x = x.astype(jnp.float32)
    if cfg.layernorm:
        x = _layer_norm(x, params['ln.weight'], params['ln.bias'])
    return x


# ---------------------------------------------------------------------------
# Decoders (reference ConvDecoder3 nn.py:716-762, decoder_1d/bias_class nn.py:287-295)
# ---------------------------------------------------------------------------

def decode_conv_fc(params: Params, cfg: GHNConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Shared first decode stage: (G, hid) -> (G, hid4, s, s) spatial maps.
    Split out so callers with many small groups (the genotype interpreter) can
    run it ONCE over all nodes as one MXU-sized matmul and feed the per-node
    tails via :func:`decode_conv` ``z=``."""
    g = x.shape[0]
    z = x @ params['decoder.fc.0.weight'].T + params['decoder.fc.0.bias']
    return jax.nn.relu(z).reshape(g, cfg.hid * 4, cfg.spatial, cfg.spatial)


def decode_conv(params: Params, cfg: GHNConfig, x: jnp.ndarray,
                target_sz: Tuple[int, int, int, int], class_pred: bool,
                z: jnp.ndarray = None) -> jnp.ndarray:
    """Group decode of 2d/4d tensors.

    :param x: (G, hid) node embeddings of one shape-key group (ignored when a
        precomputed ``z`` from :func:`decode_conv_fc` is given).
    :param target_sz: the canonical decode shape key (out, in, kh, kw).
    :return: (G, out, in, kh', kw') weights (kh' = min(kh, s)), or
             (G, num_classes, in) when ``class_pred``.
    """
    s = cfg.spatial
    hid4 = cfg.hid * 4
    co, ci, kh, kw = target_sz

    if z is None:
        z = decode_conv_fc(params, cfg, x)
    g = z.shape[0]

    if cfg.is_ghn2:
        z = z[:, :, :kh, :kw]      # GHN-2: corner crop (nn.py:739-740)
    else:
        off = s // 2
        h0 = max(0, off - kh // 2)
        h1 = off + int(np.ceil(kh / 2))
        w0 = max(0, off - kw // 2)
        w1 = off + int(np.ceil(kw / 2))
        z = z[:, :, h0:h1, w0:w1]
    khc, kwc = min(s, kh), min(s, kw)

    z = z.transpose(0, 2, 3, 1)                                            # (G, kh, kw, hid4)
    z = jax.nn.relu(z @ params['decoder.conv.0.weight'].T + params['decoder.conv.0.bias'])
    z = z @ params['decoder.conv.2.weight'].T + params['decoder.conv.2.bias']  # (G,kh,kw,o*i)
    z = z.transpose(0, 3, 1, 2).reshape(g, cfg.max_shape[0], cfg.max_shape[1], khc, kwc)
    z = z[:, :, :ci]

    if min(kh, kw) > min(khc, kwc):
        # kernel larger than the decoder canvas: bilinear upsample (nn.py:751-753)
        z = jax.image.resize(z, (*z.shape[:3], kh, kw), method='bilinear')

    if class_pred:
        k = z.shape[-1] // 2
        c = z[:, :, :, k, k]                                               # (G, out, in)
        c = jax.nn.relu(c.transpose(0, 2, 1))                              # (G, in, out)
        c = c @ params['decoder.class_layer_predictor.1.weight'].T \
            + params['decoder.class_layer_predictor.1.bias']               # (G, in, classes)
        return c.transpose(0, 2, 1)                                        # (G, classes, in)
    return z[:, :co]


def decode_1d(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(G, hid) -> (G, 2*max_ch) weight/bias channel pairs."""
    z = jax.nn.relu(x @ params['decoder_1d.fc.0.weight'].T + params['decoder_1d.fc.0.bias'])
    return z @ params['decoder_1d.fc.2.weight'].T + params['decoder_1d.fc.2.bias']


def decode_bias_class(params: Params, w: jnp.ndarray) -> jnp.ndarray:
    """(G, 2, max_ch) -> (G, 2, num_classes) classifier-bias head."""
    return jax.nn.relu(w) @ params['bias_class.1.weight'].T + params['bias_class.1.bias']
