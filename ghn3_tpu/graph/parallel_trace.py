"""Parallel host-side graph compilation.

Graph building (torch autograd walk + filtering) is pure host work of ~1-3 s per
architecture — the wall-clock bottleneck of large eval sweeps. GraphDefs are
plain numpy and pickle cleanly, so tracing fans out over a process pool; the
attached ``net`` reference stays in the parent (workers return bare graphs).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

from .graphdef import GraphDef


def _trace_one(item):
    name, factory, kwargs, ve_cutoff = item
    model = factory(**kwargs)
    from .torch_trace import trace_torch_model
    g = trace_torch_model(model, ve_cutoff=ve_cutoff)
    g.net = None  # keep workers' torch modules out of the pickle
    return name, g


def trace_parallel(factories: Dict[str, Callable], ve_cutoff: int = 50,
                   workers: Optional[int] = None,
                   factory_kwargs: Optional[Dict[str, dict]] = None) -> Dict[str, GraphDef]:
    """Trace many architectures concurrently.

    :param factories: {name: picklable model factory}
    :param factory_kwargs: optional per-name constructor kwargs
    :return: {name: GraphDef} (``net`` left unset)
    """
    items = [(name, fn, (factory_kwargs or {}).get(name, {}), ve_cutoff)
             for name, fn in factories.items()]
    workers = workers if workers is not None else min(len(items), os.cpu_count() or 1)
    if workers <= 1 or len(items) == 1:
        return dict(_trace_one(it) for it in items)
    import multiprocessing as mp
    ctx = mp.get_context('fork' if hasattr(os, 'fork') else 'spawn')
    with ctx.Pool(workers) as pool:
        return dict(pool.map(_trace_one, items))
