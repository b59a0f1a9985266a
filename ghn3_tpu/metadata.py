"""Published GHN-3 results metadata: norm checks and per-arch accuracy tables.

Reference surface: `get_metadata` / `norm_check` (/root/reference/ghn3/nn.py:783-861).
The metadata file `ghn3_results.json` is the published jsonl table of 74
torchvision architectures (accuracies + parameter norms) distributed with the
reference and on the HF hub; vendored here (md5-pinned, same as nn.py:833-835)
so parity checks work offline.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

from .utils.logging import log

_MD5 = 'c9ffc3b9222e872af316eb1cb1ee1c08'
_LOCAL = os.path.join(os.path.dirname(__file__), 'data', 'ghn3_results.json')

_KEY_BY_CKPT = {
    'ghn3xlm16.pt': 'ghn3',
    'ghn3tm8.pt': 'ghn3-t',
    'ghn2.pt': 'ghn2',
    'randinit': 'randinit',
}


def get_metadata(ghn3_name: Optional[str] = 'ghn3xlm16.pt', arch: Optional[str] = None,
                 attr: Optional[str] = None, path: Optional[str] = None):
    """Published per-architecture metrics, filtered per GHN variant."""
    key = None
    if ghn3_name is not None:
        key = _KEY_BY_CKPT.get(ghn3_name)
        if key is None:
            log('WARNING: metadata not available for %s' % ghn3_name)
            return None

    path = path or _LOCAL
    with open(path, 'rb') as f:
        payload = f.read()
    md5 = hashlib.md5(payload).hexdigest()
    assert md5 == _MD5, f'corrupted {path}: md5={md5}'

    meta: Dict[str, Dict[str, str]] = {}
    for line in payload.decode().splitlines():
        line = line.strip().rstrip(',')
        if line and line not in '{}':
            meta.update(json.loads('{' + line.strip('{}') + '}')
                        if not line.startswith('{') else json.loads(line))

    if key is None:
        return meta

    filtered: Dict[str, Dict[str, float]] = {}
    for a, row in meta.items():
        filtered[a] = {}
        for k, v in row.items():
            if k.startswith('ghn3-t') and key == 'ghn3':
                continue
            if k.startswith(key):
                filtered[a][k.split('-')[-1]] = float(v)

    if arch is not None:
        filtered = filtered[arch]
        if attr is not None:
            return filtered[attr]
        return filtered
    if attr is not None:
        return {a: filtered[a][attr] for a in filtered}
    return filtered


def norm_check(model, arch: str = 'resnet50', ghn3_name: str = 'ghn3xlm16.pt',
               tol: float = 1e-2) -> bool:
    """Total predicted-parameter L2 norm vs the published per-arch `paramnorm`
    (reference norm_check). ``model`` is a torch module or a param dict."""
    import numpy as np
    if hasattr(model, 'parameters'):
        from .torch_interop import total_param_norm
        total = total_param_norm(model)
    else:
        norms = [float(np.linalg.norm(np.asarray(p).ravel())) for p in model.values()]
        total = float(np.linalg.norm(norms))
    expected = get_metadata(ghn3_name, arch=arch, attr='paramnorm')
    ok = expected is not None and abs(expected - total) < tol
    log('Predicted params total norm={:.4f} ({})'.format(
        total, ('check passed!' if ok else 'ERROR: norm check not matched with %.2f' % expected)
        if expected else 'no norm check available'))
    return ok
