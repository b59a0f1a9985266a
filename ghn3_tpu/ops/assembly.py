"""Predicted-parameter assembly: tiling decoded tensors to target shapes and
fan-in weight normalization.

Numerics replicate the reference exactly (center-offset cropping, channel tiling,
sigmoid/tanh squashing — /root/reference/ghn3/nn.py:422-592); any deviation breaks
parity with pretrained checkpoints. Host-side numpy: these ops are cheap slicing /
repeats compared to the device-side decode matmuls.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np


def _xp(w):
    """Array namespace dispatch: numpy for host assembly, jax.numpy inside jitted
    training programs (shapes are static either way)."""
    if isinstance(w, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def _tile(xp, w, reps):
    return np.tile(w, reps) if xp is np else _xp(w).tile(w, reps)


def tile_params(w: np.ndarray, target_shape: Sequence[int],
                rng: Optional[np.random.Generator] = None,
                corner: bool = False) -> np.ndarray:
    """Crop/tile a decoded tensor ``w`` to ``target_shape`` (reference `_tile_params`,
    nn.py:422-506). GHN-3 uses center-offset crops; ``corner=True`` selects the
    GHN-2 corner-crop branches (nn.py:451-452,498-499).

    :param rng: randomness source for the ViT class-token row appended in the 3d
        positional-embedding path (reference uses torch.normal(std=0.02)).
    """
    xp = _xp(w)
    t = tuple(int(v) for v in target_shape)
    s = w.shape

    if len(t) == 1:
        if len(s) == 1:
            w = w[:min(t[0], s[0])]
        elif len(s) == 2:
            w = w[:min(t[0], s[0]), 0]
        elif len(s) > 2:
            w = w[:min(t[0], s[0]), 0, w.shape[-2] // 2, w.shape[-1] // 2]
    elif len(t) == 2:
        if len(s) == 2:
            w = w[:min(t[0], s[0]), :min(t[1], s[1])]
        elif len(s) > 2:
            w = w[:min(t[0], s[0]), :min(t[1], s[1]), w.shape[-2] // 2, w.shape[-1] // 2]
    elif len(t) == 3:
        if len(s) == 3:
            w = w[:min(t[0], s[0]), :min(t[1], s[1]), :min(t[2], s[2])]
        elif len(s) > 3:
            # ViT positional embeddings: (1, C, s, s) -> (1, tokens, C) + class token
            w = w.reshape(*s[:2], -1).transpose(0, 2, 1)
            w = w[:min(t[0], w.shape[0]), :min(t[1], w.shape[1]), :min(t[2], w.shape[2])]
            rng = rng or np.random.default_rng()
            cls_tok = rng.normal(0.0, 0.02, size=(1, 1, w.shape[2])).astype(np.float32)
            w = xp.concatenate((xp.asarray(cls_tok, dtype=w.dtype), w), axis=1)
    else:
        s2 = min(t[2], s[2]) if len(s) > 2 else 1
        s3 = min(t[3], s[3]) if len(s) > 3 else 1
        if len(s) > 2:
            if corner:
                w = w[:min(t[0], s[0]), :min(t[1], s[1]), :s2, :s3]
            else:
                off = (w.shape[-2] // 2, w.shape[-1] // 2)
                w = w[:min(t[0], s[0]), :min(t[1], s[1]),
                      off[0] - s2 // 2: off[0] + int(math.ceil(s2 / 2)),
                      off[1] - s3 // 2: off[1] + int(math.ceil(s3 / 2))]
        else:
            w = w[:min(t[0], s[0]), :min(t[1], s[1])][:, :, None, None]

    s = w.shape
    assert len(s) == len(t), (s, t)

    # tile output channels
    if t[0] > s[0]:
        n_out = int(math.ceil(t[0] / s[0]))
        reps = (n_out,) + (1,) * (len(t) - 1)
        w = _tile(xp, w, reps)[:t[0]]

    # tile input channels
    if len(t) > 1:
        if t[1] > s[1]:
            n_in = int(math.ceil(t[1] / s[1]))
            reps = (1, n_in) + (1,) * (len(t) - 2)
            w = _tile(xp, w, reps)[:, :t[1]]
        elif len(t) == 3 and len(s) == 3 and t[2] > s[2]:
            n_in = int(math.ceil(t[2] / s[2]))
            w = _tile(xp, w, (1, 1, n_in))[:, :, :t[2]]

    # final crop
    if len(t) == 1:
        w = w[:t[0]]
    elif len(t) == 2:
        w = w[:t[0], :t[1]]
    elif len(t) == 3:
        w = w[:t[0], :t[1], :t[2]]
    elif corner:
        w = w[:t[0], :t[1], :t[2], :t[3]]
    else:
        off = (w.shape[-2] // 2, w.shape[-1] // 2)
        w = w[:t[0], :t[1],
              off[0] - t[2] // 2: off[0] + int(math.ceil(t[2] / 2)),
              off[1] - t[3] // 2: off[1] + int(math.ceil(t[3] / 2))]
    return w


def tile_params_flat(w, target_shape: Sequence[int], corner: bool = False):
    """Device-layout-friendly tile_params for 4-D conv targets: produces the
    SAME elements in C-order but shaped (t0, t1*kh*kw).

    Rationale: XLA/TPU lays the two minormost dims of a tensor out in (8,128)
    tiles, so any large (..., cout, cin, 3, 3) intermediate pads 3 -> 128 lanes
    (~57x its logical HBM size — observed 8.2 GB for one regnet_y_32gf grouped
    conv run). Cropping the kernel while it is still small, then tiling channels
    on a flattened (cout, cin*kh*kw) view, keeps every intermediate at ~1x.
    Semantics match tile_params exactly (center/corner crops, cyclic channel
    tiling); equality is unit-tested element-for-element.
    """
    import jax.numpy as jnp
    t = tuple(int(v) for v in target_shape)
    assert len(t) == 4 and w.ndim == 4, (t, w.shape)
    s = w.shape
    s2, s3 = min(t[2], s[2]), min(t[3], s[3])
    if corner:
        w = w[:, :, :s2, :s3]
    else:
        off = (s[2] // 2, s[3] // 2)
        w = w[:, :, off[0] - s2 // 2: off[0] + int(math.ceil(s2 / 2)),
              off[1] - s3 // 2: off[1] + int(math.ceil(s3 / 2))]
    s = w.shape
    khkw = s[2] * s[3]
    w2 = w.reshape(s[0], s[1] * khkw)
    if t[0] > s[0]:
        w2 = jnp.take(w2, jnp.arange(t[0]) % s[0], axis=0)
    else:
        w2 = w2[:t[0]]
    if t[1] > s[1]:
        idx = ((jnp.arange(t[1]) % s[1])[:, None] * khkw
               + jnp.arange(khkw)[None, :]).reshape(-1)
        w2 = jnp.take(w2, idx, axis=1)
    else:
        w2 = w2[:, :t[1] * khkw]
    return w2


def normalize_params(p: np.ndarray, is_w: bool,
                     unit_var: bool = False) -> np.ndarray:
    """Fan-in renormalization of a predicted tensor (reference `_normalize`,
    nn.py:554-592, applied when weight_norm=True).

    ``unit_var`` (GHNConfig.unit_var_norm, off-protocol, default off):
    RMS-normalize the tensor first so the fan-in rescale lands at exactly-He
    magnitude regardless of the decoded values' scale (see config.py)."""
    xp = _xp(p)
    if p.ndim > 1:
        sz = p.shape
        if len(sz) > 2 and sz[2] >= 11 and sz[0] == 1:
            return p  # positional encodings are not normalized
        no_relu = len(sz) > 2 and (sz[1] == 1 or sz[2] < sz[3])
        beta = 1.0 if no_relu else 2.0
        if unit_var:
            p = p / (xp.sqrt((p * p).mean()) + 1e-8)
        return p * math.sqrt(beta / max(1, int(np.prod(sz[1:]))))
    if is_w:
        return 2.0 / (1.0 + xp.exp(-0.5 * p))   # 2*sigmoid(0.5 p): norm weights in [0, 2]
    return xp.tanh(0.2 * p)                      # biases in [-1, 1]


def min_decode_size(n: int, max_n: int) -> int:
    """Canonical per-dimension decode size (reference `min_sz`, nn.py:652-660):
    caps at max_shape, snaps multiples of 3 up to multiples of 4, and rounds
    anything >= max/2 to max — grouping shapes to a small key set."""
    n = min(n, max_n)
    if n % 3 == 0:
        n = n // 3 * 4
    if n >= max_n / 2:
        n = max_n
    return n


def decode_key(sz: Tuple[int, ...], max_shape: Tuple[int, int, int, int],
               last_weight: bool, last_bias: bool) -> Tuple[int, ...]:
    """Canonical shape-group key for a target tensor (reference nn.py:652-675)."""
    def ms(j):
        return min_decode_size(sz[j], max_shape[j])

    if len(sz) == 1:
        return (ms(0), -1) if last_bias else (ms(0), 0)
    if last_weight:
        return (ms(0), ms(1))
    if len(sz) == 2:
        return (ms(0), ms(1), 1, 1)
    if len(sz) == 3:
        if sz[0] == 1 and min(sz[1:]) > 1:
            s = int(math.floor(sz[1] ** 0.5))
            return (1, sz[2], s, s)
        return (ms(0), ms(1), ms(2))
    return (ms(0), ms(1), sz[2], sz[3])
