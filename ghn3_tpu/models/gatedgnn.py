"""GatedGNN propagation for GHN-2 checkpoints (EXPERIMENTAL).

GHN-2 (Knyazev et al. 2021) propagates node states with a GRU along the DAG:
one round of sequential updates in forward topological order, then one in
backward order; messages are MLP-transformed neighbor states, averaged over
incoming edges, with a separate MLP and 1/distance scaling for virtual edges
(shortest-path distance > 1).

The parameter layout matches the published checkpoints
(``gnn.mlp.fc.*``, ``gnn.mlp_ve.fc.*``, ``gnn.gru.weight_ih/hh, bias_ih/hh``).
Status: golden-tested at 1e-5 against the reference GHN3(is_ghn2=True) running
over the shim GatedGNN oracle (tests/test_ghn2.py), which validates the full
GHN-2 integration (sparse batching, corner-crop tiling, decoder paths). The
GatedGNN spec itself is reconstructed from the paper — final external pinning
needs the published ghn2.pt (fixture-gated tests, docs/PROVENANCE.md).

TPU formulation: topological *levels* are computed host-side; the device loop
runs ``lax.fori_loop`` over levels with masked GRU updates — sequential
semantics without data-dependent Python control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GHNConfig

Params = dict


def topo_levels(adj: np.ndarray, n_pad: int) -> np.ndarray:
    """Level index per node (longest-path depth from sources) over the 1-hop
    graph; padded nodes get level -1. Host-side, used as a static input."""
    a = adj == 1
    n = a.shape[0]
    level = np.zeros(n, dtype=np.int32)
    indeg = a.sum(0)
    from collections import deque
    q = deque(int(i) for i in np.where(indeg == 0)[0])
    remaining = indeg.copy()
    while q:
        u = q.popleft()
        for v in np.where(a[u])[0]:
            level[v] = max(level[v], level[u] + 1)
            remaining[v] -= 1
            if remaining[v] == 0:
                q.append(int(v))
    out = np.full(n_pad, -1, dtype=np.int32)
    out[:n] = level
    return out


def _gru_cell(params: Params, m, h):
    """torch nn.GRUCell semantics."""
    w_ih = params['gnn.gru.weight_ih']     # (3H, H)
    w_hh = params['gnn.gru.weight_hh']
    b_ih = params.get('gnn.gru.bias_ih', 0.0)
    b_hh = params.get('gnn.gru.bias_hh', 0.0)
    gi = m @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    hsz = h.shape[-1]
    i_r, i_z, i_n = gi[..., :hsz], gi[..., hsz:2 * hsz], gi[..., 2 * hsz:]
    h_r, h_z, h_n = gh[..., :hsz], gh[..., hsz:2 * hsz], gh[..., 2 * hsz:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _mlp(params: Params, prefix: str, x):
    y = jax.nn.relu(x @ params[prefix + 'fc.0.weight'].T + params[prefix + 'fc.0.bias'])
    return jax.nn.relu(y @ params[prefix + 'fc.2.weight'].T + params[prefix + 'fc.2.bias'])


def gated_gnn_forward(params: Params, cfg: GHNConfig,
                      x: jnp.ndarray,        # (B, N, hid)
                      adj: jnp.ndarray,      # (B, N, N) distances
                      levels: jnp.ndarray,   # (B, N) int32, -1 for padding
                      mask: jnp.ndarray,     # (B, N)
                      ) -> jnp.ndarray:
    has_ve = any(k.startswith('gnn.mlp_ve.') for k in params)
    a1 = (adj == 1).astype(jnp.float32)                       # (B, N, N) 1-hop
    if has_ve:
        av = jnp.where(adj > 1, 1.0 / jnp.maximum(adj, 1).astype(jnp.float32), 0.0)
    max_level = int(levels.shape[1])

    def propagate(h, transpose: bool):
        a1d = a1 if not transpose else a1.transpose(0, 2, 1)
        avd = (av if not transpose else av.transpose(0, 2, 1)) if has_ve else None
        n_in = a1d.sum(1) + (avd.sum(1) if has_ve else 0.0)   # per-direction in-degree
        denom = jnp.maximum(n_in, 1.0)[..., None]

        def body(step, h):
            lvl = max_level - 1 - step if transpose else step
            msg = jnp.einsum('bmn,bmh->bnh', a1d, _mlp(params, 'gnn.mlp.', h))
            if has_ve:
                msg = msg + jnp.einsum('bmn,bmh->bnh', avd,
                                       _mlp(params, 'gnn.mlp_ve.', h))
            msg = msg / denom
            h_new = _gru_cell(params, msg, h)
            upd = (levels == lvl)[..., None]
            return jnp.where(upd, h_new, h)

        return jax.lax.fori_loop(0, max_level, body, h)

    h = propagate(x, transpose=False)   # forward sweep
    h = propagate(h, transpose=True)    # backward sweep
    return h * mask[..., None]
