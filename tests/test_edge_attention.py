"""Pallas fused edge-bias attention vs the XLA reference (interpret mode on CPU)."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ghn3_tpu.ops import edge_attention as ea


def _run_interpret(q, k, v, bias, scale):
    bh, n, d = q.shape
    bi = ea._row_tile(n)
    kernel = functools.partial(ea._kernel, scale=scale, bj=bi)
    return pl.pallas_call(
        kernel,
        grid=(bh, n // bi),
        in_specs=[
            pl.BlockSpec((1, bi, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bi, n), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bi, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=True,
    )(q, k, v, bias)


@pytest.mark.parametrize('n,d', [(64, 24), (128, 32), (96, 16)])
def test_flash_matches_reference(n, d):
    rng = np.random.default_rng(0)
    bh = 4
    q = rng.normal(size=(bh, n, d)).astype(np.float32)
    k = rng.normal(size=(bh, n, d)).astype(np.float32)
    v = rng.normal(size=(bh, n, d)).astype(np.float32)
    bias = rng.normal(size=(bh, n, n)).astype(np.float32)
    # mask the tail like a padded graph batch
    bias[:, :, -7:] = -2.0 ** 15
    scale = d ** -0.5
    ref = ea.reference_bias_attention(*map(jnp.asarray, (q, k, v, bias)), scale)
    out = _run_interpret(*map(jnp.asarray, (q, k, v, bias)), scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fully_masked_rows_match_reference():
    """Padded query rows: all scores -2^15 -> uniform softmax, same as reference."""
    rng = np.random.default_rng(1)
    bh, n, d = 2, 32, 16
    q = rng.normal(size=(bh, n, d)).astype(np.float32)
    k = rng.normal(size=(bh, n, d)).astype(np.float32)
    v = rng.normal(size=(bh, n, d)).astype(np.float32)
    bias = np.full((bh, n, n), -2.0 ** 15, dtype=np.float32)
    ref = ea.reference_bias_attention(*map(jnp.asarray, (q, k, v, bias)), 0.25)
    out = _run_interpret(*map(jnp.asarray, (q, k, v, bias)), 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
