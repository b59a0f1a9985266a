"""Orbax checkpoint backend (optional alternative to the npz format).

Gives the ecosystem-standard on-disk layout (per-tensor Zarr-like storage,
partial restore, multi-host-safe atomic commits) for large GHN checkpoints.
The Trainer uses npz by default; pass ``backend='orbax'`` to switch.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np


def save(path: str, params: Dict, opt_state=None, meta: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {'params': dict(params)}
    if opt_state is not None:
        flat, treedef = jax.tree_util.tree_flatten(opt_state)
        payload['opt_flat'] = {str(i): leaf for i, leaf in enumerate(flat)}
        meta = dict(meta or {})
        meta['opt_treedef'] = pickle.dumps(treedef).hex()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, payload)
    if meta:
        with open(os.path.join(path, 'meta.pkl'), 'wb') as f:
            pickle.dump(meta, f)


def restore(path: str) -> Tuple[Dict, Optional[object], dict]:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    meta = {}
    meta_path = os.path.join(path, 'meta.pkl')
    if os.path.exists(meta_path):
        with open(meta_path, 'rb') as f:
            meta = pickle.load(f)
    opt_state = None
    if 'opt_flat' in payload and 'opt_treedef' in meta:
        flat = [payload['opt_flat'][str(i)] for i in range(len(payload['opt_flat']))]
        treedef = pickle.loads(bytes.fromhex(meta['opt_treedef']))
        opt_state = jax.tree_util.tree_unflatten(treedef, flat)
    params = {k: v for k, v in payload['params'].items()}
    return params, opt_state, meta
