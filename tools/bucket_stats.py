#!/usr/bin/env python
"""Measure interpreter bucket cardinality on a DeepNets-1M sampling stream.

The genotype-as-data executor compiles one XLA program per `ArchBucket`
(nets/interpreter.py); the wider_nets randomization draws C and fc_dim per
sample (reference /root/reference/ghn3/deepnets1m.py:99-133), so the number of
distinct buckets a training run touches — and therefore its cold-cache compile
wall — depends on the dataset's macro-config distribution and the width pools.
This tool streams N draws from a dataset exactly like training would and
reports the bucket histogram plus a projected cold-start warmup cost.

  python tools/bucket_stats.py --nets_dir ./data -n 10000
  python tools/bucket_stats.py --nets_dir ./data -n 10000 --num_ch 32,64 --fc_dims 128
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nets_dir', default='./data')
    ap.add_argument('-n', '--draws', type=int, default=10000)
    ap.add_argument('--num_classes', type=int, default=10)
    ap.add_argument('--imagenet', action='store_true')
    ap.add_argument('--imsize', type=int, default=0)
    ap.add_argument('--num_ch', type=str, default=None)
    ap.add_argument('--fc_dims', type=str, default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--sec-per-bucket', type=float, default=323.6,
                    help='projected compile cost per cold bucket (BENCH_r02 '
                         'measured 323.6s for the unrolled meta-bs-8 program)')
    ap.add_argument('--json', type=str, default=None, help='write stats here')
    args = ap.parse_args()

    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.nets.interpreter import bucket_of

    pools = {}
    if args.num_ch:
        pools['num_ch_pool'] = [int(v) for v in args.num_ch.split(',')]
    if args.fc_dims:
        pools['fc_dim_pool'] = [int(v) for v in args.fc_dims.split(',')]
    ds = DeepNets1M(split='train', nets_dir=args.nets_dir,
                    large_images=args.imagenet, seed=args.seed,
                    attach_net=False, **pools)
    vocab = ds.interpreter_vocab()

    rng = np.random.default_rng(args.seed)
    hist = collections.Counter()
    first_seen = {}
    for t in range(args.draws):
        idx = int(rng.integers(0, len(ds)))
        stored = ds.nets[idx]
        from ghn3_tpu.graph.genotypes import from_dict
        geno = from_dict(stored['genotype'])
        net_args = dict(ds._sample_args(stored, geno))
        net_args['genotype'] = geno
        b = bucket_of(net_args, args.num_classes, args.imagenet,
                      input_size=args.imsize, vocab=tuple(vocab))
        hist[b] += 1
        if b not in first_seen:
            first_seen[b] = t

    n_buckets = len(hist)
    counts = np.array(sorted(hist.values(), reverse=True))
    cover = np.cumsum(counts) / counts.sum()
    k90 = int(np.searchsorted(cover, 0.90) + 1)
    k99 = int(np.searchsorted(cover, 0.99) + 1)
    stats = {
        'draws': args.draws,
        'dataset_nets': len(ds),
        'distinct_buckets': n_buckets,
        'buckets_for_90pct': k90,
        'buckets_for_99pct': k99,
        'top10_counts': counts[:10].tolist(),
        'projected_cold_warmup_hours': round(n_buckets * args.sec_per_bucket / 3600, 2),
        'projected_90pct_warmup_hours': round(k90 * args.sec_per_bucket / 3600, 2),
        'num_ch_pool': ds.num_ch.tolist(),
        'fc_dim_pool': ds.fc_dim.tolist(),
    }
    print(json.dumps(stats, indent=1))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(stats, f, indent=1)


if __name__ == '__main__':
    main()
