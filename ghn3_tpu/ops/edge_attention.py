"""Fused edge-biased attention (Pallas TPU kernel).

The graphormer's attention adds a per-head additive bias derived from graph
edge distances and masks padded nodes (reference graphormer.py:119-141). The
XLA path materializes the (B, h, N, N) score tensor per layer; this kernel
computes attention with an online softmax over key tiles, so per-layer N²
intermediates never hit HBM — the scalable path for large node counts
(efficientnet-scale graphs, big meta-batches).

The additive bias (edge bias + mask fill, shared by all layers) is materialized
once per batch; padded rows produce the same uniform-softmax values as the
reference's -2**15 masked fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _row_tile(n: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return min(t, n)
    return n


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float, bj: int):
    q = q_ref[0].astype(jnp.float32)                    # (BI, D)
    n = k_ref.shape[1]
    bi, d = q.shape
    nj = n // bj

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bj, bj), :].astype(jnp.float32)      # (BJ, D)
        v = v_ref[0, pl.ds(j * bj, bj), :].astype(jnp.float32)
        b = b_ref[0, :, pl.ds(j * bj, bj)].astype(jnp.float32)      # (BI, BJ)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST) * scale + b
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jnp.dot(p, v, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        return m_new, l, acc

    m0 = jnp.full((bi, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bi, 1), jnp.float32)
    a0 = jnp.zeros((bi, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nj, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('scale',))
def flash_bias_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, scale: float) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v with online softmax.

    :param q, k, v: (BH, N, D)
    :param bias: (BH, N, N) additive bias incl. the mask fill
    :return: (BH, N, D)
    """
    bh, n, d = q.shape
    bi = _row_tile(n)
    bj = _row_tile(n)
    grid = (bh, n // bi)
    kernel = functools.partial(_kernel, scale=scale, bj=bj)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bi, n), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bi, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
    )(q, k, v, bias)


def reference_bias_attention(q, k, v, bias, scale):
    """XLA reference implementation (for tests and the fallback path)."""
    s = jnp.einsum('bnd,bmd->bnm', q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum('bnm,bmd->bnd', p, v.astype(jnp.float32)).astype(q.dtype)
