#!/usr/bin/env python
"""Parallel cold-start warmup: AOT-compile the interpreter training step for
every bucket a dataset's sampling stream will touch, in a thread pool, priming
the persistent compilation cache.

Bucket programs compile independently, so a 16-thread pool turns the serial
cold start (~48 programs x minutes each on the full wider_nets distribution
after width folding — docs/DESIGN.md §9) into wall-clock minutes. Run once per
machine/config; training then starts at steady state via the persistent cache.

  python tools/precompile.py --nets_dir ./data -m 8 -b 128 --hid 64 \\
      --layers 3 --heads 8 --pad_nodes 128 --threads 16
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nets_dir', default='./data')
    ap.add_argument('-n', '--draws', type=int, default=2000,
                    help='stream length used to discover buckets')
    ap.add_argument('-m', '--meta_batch_size', type=int, default=8)
    ap.add_argument('-b', '--batch_size', type=int, default=128)
    ap.add_argument('-i', '--imsize', type=int, default=32)
    ap.add_argument('--hid', type=int, default=64)
    ap.add_argument('--layers', type=int, default=3)
    ap.add_argument('--heads', type=int, default=8)
    ap.add_argument('--num_classes', type=int, default=10)
    ap.add_argument('--imagenet', action='store_true')
    ap.add_argument('--num_ch', type=str, default=None)
    ap.add_argument('--fc_dims', type=str, default=None)
    ap.add_argument('--pad_nodes', type=str, default=None)
    ap.add_argument('--threads', type=int, default=min(16, os.cpu_count() or 8))
    ap.add_argument('--unit_var_norm', action='store_true',
                    help='compile the off-protocol unit-variance decode '
                         'programs (GHNConfig.unit_var_norm)')
    ap.add_argument('--max_buckets', type=int, default=None)
    ap.add_argument('--platform', type=str, default=None)
    ap.add_argument('--seed', type=int, default=1111)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from ghn3_tpu import GHN3, GHNConfig
    from ghn3_tpu.data.deepnets1m import DeepNets1M, NodeBudgetSampler
    from ghn3_tpu.parallel.meta_executor import stream_interp_batches
    from ghn3_tpu.parallel.trainer import Trainer
    from ghn3_tpu.utils.logging import log

    s = 16 if args.imagenet else 11
    cfg = GHNConfig(hid=args.hid, heads=args.heads, layers=args.layers,
                    max_shape=(64, 64, s, s), num_classes=args.num_classes,
                    weight_norm=True, layernorm=True,
                    unit_var_norm=args.unit_var_norm)
    ghn = GHN3(cfg, seed=args.seed)
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 4e-4, 'weight_decay': 1e-2},
                      n_batches=1, predparam_wd=3e-5)

    pools = {}
    if args.num_ch:
        pools['num_ch_pool'] = [int(v) for v in args.num_ch.split(',')]
    if args.fc_dims:
        pools['fc_dim_pool'] = [int(v) for v in args.fc_dims.split(',')]
    ds = DeepNets1M(split='train', nets_dir=args.nets_dir, attach_net=False,
                    large_images=args.imagenet, seed=args.seed, **pools)
    sampler = NodeBudgetSampler(ds, meta_batch_size=args.meta_batch_size,
                                seed=args.seed)
    pad_buckets = tuple(int(v) for v in args.pad_nodes.split(',')) \
        if args.pad_nodes else None
    stream = stream_interp_batches(ds, sampler, cfg, args.meta_batch_size,
                                   num_classes=args.num_classes,
                                   is_imagenet_input=args.imagenet,
                                   vocab=ds.interpreter_vocab(),
                                   pad_buckets=pad_buckets,
                                   input_size=args.imsize)

    # discover one representative meta-batch per distinct program key
    reps = {}
    seen = 0
    for ib in stream:
        seen += args.meta_batch_size
        if ib.key not in reps:
            reps[ib.key] = ib
            log(f'bucket {len(reps)} discovered after ~{seen} nets')
        if seen >= args.draws or \
                (args.max_buckets and len(reps) >= args.max_buckets):
            break
    log(f'{len(reps)} distinct programs to compile '
        f'({args.threads} threads, device {jax.devices()[0]})')

    import jax.numpy as jnp
    images = jax.ShapeDtypeStruct((args.batch_size, 3, args.imsize, args.imsize),
                                  jnp.float32)
    labels = jax.ShapeDtypeStruct((args.batch_size,), jnp.int32)
    p_s = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), trainer._params())
    o_s = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), trainer.opt_state)

    def compile_one(key_ib):
        key, ib = key_ib
        t0 = time.time()
        fn = trainer._interp_step_fn(ib)
        b = ib.batch
        lev = jax.ShapeDtypeStruct(b.node_op.shape, jnp.int32)
        arch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                for k, v in ib.arch.items()}
        lowered = fn.lower(p_s, o_s,
                           jax.ShapeDtypeStruct(b.node_op.shape, jnp.int32),
                           jax.ShapeDtypeStruct(b.adj.shape, jnp.int32),
                           jax.ShapeDtypeStruct(ib.shape_ind.shape, jnp.int32),
                           jax.ShapeDtypeStruct(b.mask.shape, jnp.bool_),
                           lev, arch, images, labels)
        lowered.compile()
        return key, time.time() - t0

    from concurrent.futures import ThreadPoolExecutor
    t0 = time.time()
    times = []
    with ThreadPoolExecutor(args.threads) as pool:
        for key, dt in pool.map(compile_one, reps.items()):
            times.append(dt)
            log(f'compiled {len(times)}/{len(reps)} ({dt:.0f}s): {key[0].C=} '
                f'{key[0].n_cells=}')
    wall = time.time() - t0
    print(json.dumps({'programs': len(reps), 'threads': args.threads,
                      'wall_sec': round(wall, 1),
                      'sum_compile_sec': round(sum(times), 1),
                      'speedup': round(sum(times) / max(1e-9, wall), 2)}))


if __name__ == '__main__':
    main()
