"""Disk cache for compiled GraphDefs.

Host graph compilation costs ~1-3 s per architecture (torch autograd walk);
sweeps and benchmarks re-trace the same canonical architectures every run. The
cache stores the numpy payload + node metadata keyed by (name, ve_cutoff,
cache_version), so repeat runs skip tracing entirely.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
from typing import Callable, Optional

from .graphdef import GraphDef

# v2: zoo structures changed in round 2 (full googlenet trunk, 7x7 VGG-BN
# classifier, MNASNet rounding, exact torchvision variants)
CACHE_VERSION = 2


@functools.lru_cache(maxsize=1)
def _code_fingerprint() -> str:
    """Digest of the sources that determine a traced graph's content.

    Keying only on (name, ve_cutoff, CACHE_VERSION) once served STALE graphs
    after the round-3 ViT structural change (old `stem0.weight` node names vs
    the new torchvision-true `conv_proj.weight` tables -> zero plan matches
    and an empty-concat crash in the bench sweep). Hashing the zoo + trace
    sources auto-invalidates the cache whenever graph-affecting code changes.
    """
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in ('graph/torch_trace.py', 'graph/graphdef.py',
                'zoo/torch_zoo.py', 'zoo/jax_zoo.py', 'zoo/configs.py',
                'nets/darts.py', 'nets/darts_graph.py'):
        p = os.path.join(pkg, rel)
        try:
            with open(p, 'rb') as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:12]


def _default_dir() -> str:
    return os.environ.get(
        'GHN3_GRAPH_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), '.graph_cache'))


def cache_path(name: str, ve_cutoff: int = 50,
               cache_dir: Optional[str] = None) -> str:
    """Cache file path for ``name`` (key: name, ve_cutoff, version, code)."""
    return os.path.join(
        cache_dir or _default_dir(),
        f'{name}_ve{ve_cutoff}_v{CACHE_VERSION}_{_code_fingerprint()}.pkl')


def cached_graph(name: str, build: Callable[[], GraphDef], ve_cutoff: int = 50,
                 cache_dir: Optional[str] = None) -> GraphDef:
    """Load the graph for ``name`` from the cache, or build + store it.
    The attached ``net`` is never cached (callers re-attach their target)."""
    cache_dir = cache_dir or _default_dir()
    path = cache_path(name, ve_cutoff, cache_dir)
    if os.path.exists(path):
        try:
            with open(path, 'rb') as f:
                return pickle.load(f)
        except Exception:
            pass  # stale/corrupt entry: rebuild
    g = build()
    net = g.net
    g.net = None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            pickle.dump(g, f)
        os.replace(tmp, path)
        _prune_superseded(name, ve_cutoff, cache_dir, keep=path)
    except Exception:
        pass
    g.net = net
    return g


def _prune_superseded(name: str, ve_cutoff: int, cache_dir: str,
                      keep: str) -> None:
    """Remove this model's entries written under older code fingerprints /
    versions: every graph-affecting source edit re-keys the whole zoo
    (multi-MB pickles each), so without pruning the cache grows by a full
    stale generation per edit."""
    import glob
    for p in glob.glob(os.path.join(cache_dir, f'{name}_ve{ve_cutoff}_v*.pkl')):
        if p != keep:
            try:
                os.remove(p)
            except OSError:
                pass
