#!/usr/bin/env python
"""Stage-level timing of the prediction sweep (host graph build / plan / GHN
forward / decode / host assembly) to guide optimization."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch, bucket_size
from ghn3_tpu.graph.torch_trace import trace_torch_model
from ghn3_tpu.predict import (_decode_all_fn, _group_bucket, build_plan,
                              forward_embeddings, run_plan)
from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO


def main():
    suite = sys.argv[1:] or ['resnet50', 'resnet101', 'wide_resnet50_2']
    cfg = GHNConfig.ghn3_xl()
    ghn = GHN3(cfg, seed=0)

    t0 = time.time()
    tms = {n: TORCH_ZOO[n]() for n in suite}
    print(f'torch model build: {time.time() - t0:.2f}s')

    for name in suite:
        t0 = time.time()
        g = trace_torch_model(tms[name], ve_cutoff=cfg.ve_cutoff)
        print(f'{name}: trace {time.time() - t0:.2f}s, n_nodes={g.n_nodes}')
        globals().setdefault('graphs', {})[name] = g

    graphs = globals()['graphs']
    nets = {n: JAX_ZOO[n]() if n in JAX_ZOO else None for n in suite}

    batch = GraphBatch.from_graphs([graphs[n] for n in suite])
    tables = [nets[n].param_table() for n in suite]

    t0 = time.time()
    plan = build_plan(batch, tables, cfg)
    print(f'build_plan: {time.time() - t0:.3f}s, {len(plan.groups)} groups, '
          f'{sum(len(v) for v in plan.groups.values())} tensors')

    # warm up compiles
    x_flat = forward_embeddings(ghn.params, cfg, batch, plan.shape_ind)
    x_flat.block_until_ready()
    run_plan(ghn.params, cfg, x_flat, plan)

    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        x_flat = forward_embeddings(ghn.params, cfg, batch, plan.shape_ind)
        x_flat.block_until_ready()
    t_fwd = (time.time() - t0) / n_rep
    print(f'ghn forward (B={len(batch)}, N={batch.n_pad}): {t_fwd * 1e3:.1f} ms')

    keys = tuple(plan.groups.keys())
    x_groups = []
    for key, items in plan.groups.items():
        g = len(items)
        inds = np.zeros((_group_bucket(g),), dtype=np.int32)
        inds[:g] = [it.flat_idx for it in items]
        x_groups.append(jnp.take(x_flat, jnp.asarray(inds), axis=0))
    fn = _decode_all_fn(cfg, keys)
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(ghn.params, tuple(x_groups))
        jax.block_until_ready(out)
    t_dec = (time.time() - t0) / n_rep
    print(f'decode all groups (device): {t_dec * 1e3:.1f} ms')

    t0 = time.time()
    for _ in range(n_rep):
        host = [np.asarray(o) for o in jax.device_get(out)]
    t_get = (time.time() - t0) / n_rep
    total_mb = sum(h.nbytes for h in host) / 1e6
    print(f'device_get {total_mb:.0f} MB: {t_get * 1e3:.1f} ms')

    t0 = time.time()
    for _ in range(n_rep):
        run_plan(ghn.params, cfg, x_flat, plan)
    t_all = (time.time() - t0) / n_rep
    print(f'full run_plan (decode+get+assemble): {t_all * 1e3:.1f} ms '
          f'-> assembly ~{(t_all - t_dec - t_get) * 1e3:.1f} ms')


if __name__ == '__main__':
    main()
