"""Checkpoint interop: published torch ``.pt`` state dicts <-> JAX param pytrees,
plus native npz save/load.

The JAX param dict uses exactly the torch key names and (out, in) Linear layouts,
so conversion is a dtype-cast copy. Config inference from raw state-dict shapes
replicates the reference loader (/root/reference/ghn3/nn.py:59-100), letting us
ingest any published GHN checkpoint without a stored config.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import GHNConfig

Params = Dict[str, jnp.ndarray]


def load_state_dict_file(path: str) -> Tuple[Optional[dict], Dict[str, np.ndarray]]:
    """Load a checkpoint file into (config-or-None, numpy state dict).

    Supports: torch.save files ({'config', 'state_dict'} or a bare state dict),
    joblib dumps (HF hub format of the published GHN-3 checkpoints), and our npz.
    """
    if path.endswith('.npz'):
        data = np.load(path, allow_pickle=True)
        cfg = None
        if '__config__' in data:
            meta = data['__config__'].item()
            cfg = meta.get('config', meta) if isinstance(meta, dict) else meta
        elif '__meta__' in data:
            # Trainer checkpoint (parallel/trainer._write_checkpoint): params +
            # optimizer leaves + meta. Map the saved CLI-config vocabulary to
            # GHNConfig fields (reference from_pretrained reads the config
            # stored inside checkpoints the same way, nn.py:53-54).
            meta = data['__meta__'].item()
            cli = meta.get('config', {}) if isinstance(meta, dict) else {}
            cfg = {}
            for src, dst in (('hid', 'hid'), ('heads', 'heads'),
                             ('layers', 'layers'), ('ln', 'layernorm'),
                             ('weight_norm', 'weight_norm'),
                             ('unit_var_norm', 'unit_var_norm'),
                             ('num_classes', 'num_classes'),
                             ('ghn2', 'is_ghn2')):
                if src in cli and cli[src] is not None:
                    cfg[dst] = cli[src]
            if cli.get('virtual_edges'):
                cfg['ve'] = cli['virtual_edges'] > 1
                cfg['ve_cutoff'] = max(1, cli['virtual_edges'])
            ms = cli.get('max_shape') or (cli.get('hid', 64) * 2
                                          if cli.get('ghn2') else 64)
            s = 16 if cli.get('dataset') == 'imagenet' else 11
            cfg['max_shape'] = (ms, ms, s, s)
            cfg = cfg or None
        sd = {k: data[k] for k in data.files
              if k not in ('__config__', '__meta__')
              and not k.startswith('__opt__')}
        return cfg, sd

    state = None
    try:
        import joblib
        state = joblib.load(path)
    except Exception:
        state = None
    if state is None:
        import torch
        state = torch.load(path, map_location='cpu', weights_only=False)

    config = None
    if isinstance(state, dict) and 'state_dict' in state:
        config = state.get('config', None)
        state = state['state_dict']

    sd = {}
    for k, v in state.items():
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)
    return config, sd


def is_ghn2_state_dict(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.find('gnn.gru.') >= 0 for k in sd)


def infer_config(sd: Dict[str, np.ndarray], **overrides) -> GHNConfig:
    """Infer the GHN architecture from state-dict tensor shapes (nn.py:59-100)."""
    num_classes = overrides.pop('num_classes', 10)
    layers = overrides.pop('layers', 0)
    hid = overrides.pop('hid', 32)
    layernorm = overrides.pop('layernorm', False)
    max_shape = overrides.pop('max_shape', 64)

    for k, p in sd.items():
        if k.find('class_layer_predictor') >= 0:
            num_classes = len(p)
            break
    s = 16 if num_classes >= 1000 else 11

    for k, p in sd.items():
        if k.endswith('ln.weight'):
            layernorm = True
        elif k.endswith('embed.weight'):
            hid = p.shape[-1]
        elif k.endswith('decoder.conv.2.weight'):
            max_shape = int(len(p) ** 0.5)
        elif k.endswith('shape_enc.embed_spatial.weight'):
            s = 11 if len(p) == 9 else 16
        elif k.endswith('ln1.weight') and k.find('gnn.') >= 0:
            layers += 1

    if not isinstance(max_shape, tuple):
        max_shape = (max_shape, max_shape, s, s)
    return GHNConfig(hid=int(hid),
                     heads=16 if hid > 64 else 8,
                     layers=int(layers),
                     max_shape=max_shape,
                     num_classes=int(num_classes),
                     layernorm=bool(layernorm),
                     is_ghn2=is_ghn2_state_dict(sd),
                     **overrides)


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: GHNConfig) -> Params:
    """Torch state dict -> JAX param dict. GHN-2 4d decoder convs are squeezed to
    2d linears (nn.py:108-111); centrality embeddings keep their top-level names."""
    params: Dict[str, jnp.ndarray] = {}
    for k, v in sd.items():
        if cfg.is_ghn2 and k.find('decoder.') >= 0 and v.ndim == 4:
            v = np.squeeze(v)
        # fresh reference inits keep the structural embeddings inside gnn.0 (they
        # are moved by fix_embed_layers); normalize to top-level names
        for name in ('centrality_embed_in', 'centrality_embed_out', 'input_dist_embed'):
            if k == f'gnn.0.{name}.weight':
                k = f'{name}.weight'
        params[k] = jnp.asarray(np.asarray(v, dtype=np.float32))
    return params


def state_dict_from_params(params: Params) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in params.items()}


def save_npz(path: str, params: Params, cfg: GHNConfig, extra: Optional[dict] = None) -> None:
    payload = {k: np.asarray(v) for k, v in params.items()}
    meta = {'config': cfg.__dict__ if not isinstance(cfg, dict) else cfg}
    if extra:
        meta.update(extra)
    payload['__config__'] = np.array(meta, dtype=object)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)
