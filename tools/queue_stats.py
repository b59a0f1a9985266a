#!/usr/bin/env python
"""Quantify BucketQueue's deviation from the reference's uniform sampler.

The reference streams uniform shuffled meta-batches (NetBatchSamplerDDP,
/root/reference/ghn3/deepnets1m.py:282-301); the TPU interpreter regroups the
same stream into bucket-homogeneous meta-batches (parallel/meta_executor.py),
which introduces two deviations: (1) stalled buckets flushed by patience
DUPLICATE nets inside a meta-batch, and (2) meta-batches are width/depth
homogeneous. This tool runs the long-run simulation and reports:

  dup_rate            — fraction of meta-batch slots filled by repeats
  flush_rate          — fraction of batches emitted via patience flush
  marginal_tv         — total-variation distance between each net's empirical
                        training frequency and the uniform marginal
  delay_p50/p95       — queueing delay (in streamed nets) from draw to batch

  python tools/queue_stats.py --nets_dir ./data/dn1m_digits -n 50000 \\
      --num_ch 32,64 --fc_dims 128
  python tools/queue_stats.py --nets_dir ./data -n 50000   # full wider_nets pools
"""
import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def simulate(ds, draws, meta_bs, patience, num_classes=10, imagenet=False,
             input_size=0, seed=0):
    """Push `draws` uniform samples through a BucketQueue; return stats."""
    from ghn3_tpu.graph.genotypes import from_dict
    from ghn3_tpu.nets.interpreter import bucket_of
    from ghn3_tpu.parallel.meta_executor import BucketQueue

    vocab = tuple(ds.interpreter_vocab())
    queue = BucketQueue(meta_bs, num_classes=num_classes,
                        is_imagenet_input=imagenet, patience=patience,
                        vocab=vocab, input_size=input_size)

    class _Fake:  # bucket_of needs only net_args; skip graph decode entirely
        __slots__ = ('net_args', 'idx', 't')

    rng = np.random.default_rng(seed)
    trained = collections.Counter()      # net idx -> slots trained on
    delays = []
    t = 0
    for _ in range(draws):
        idx = int(rng.integers(0, len(ds)))
        stored = ds.nets[idx]
        geno = from_dict(stored['genotype'])
        net_args = dict(ds._sample_args(stored, geno))
        net_args['genotype'] = geno
        g = _Fake()
        g.net_args, g.idx, g.t = net_args, idx, t
        group = queue.push(g)
        t += 1
        if group is not None:
            for m in group:
                trained[m.idx] += 1
                delays.append(t - m.t)

    s = queue.stats
    n_nets = len(ds)
    emp = np.zeros(n_nets)
    for k, v in trained.items():
        emp[k] = v
    emp = emp / max(1, emp.sum())
    uniform = np.full(n_nets, 1.0 / n_nets)
    stats = {
        'draws': draws,
        'meta_batch_size': meta_bs,
        'patience': patience,
        'batches': s['batches'],
        'dup_rate': s['dup_slots'] / max(1, s['slots']),
        'flush_rate': s['flushes'] / max(1, s['batches']),
        'marginal_tv': float(0.5 * np.abs(emp - uniform).sum()),
        'delay_p50': float(np.percentile(delays, 50)) if delays else None,
        'delay_p95': float(np.percentile(delays, 95)) if delays else None,
        'distinct_nets_trained': int((emp > 0).sum()),
        'dataset_nets': n_nets,
    }
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nets_dir', default='./data')
    ap.add_argument('-n', '--draws', type=int, default=50000)
    ap.add_argument('-m', '--meta_batch_size', type=int, default=8)
    ap.add_argument('--patience', type=int, default=None,
                    help='fixed flush patience (default: adaptive)')
    ap.add_argument('--num_ch', type=str, default=None)
    ap.add_argument('--fc_dims', type=str, default=None)
    ap.add_argument('--imagenet', action='store_true')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--json', type=str, default=None)
    args = ap.parse_args()

    from ghn3_tpu.data.deepnets1m import DeepNets1M
    pools = {}
    if args.num_ch:
        pools['num_ch_pool'] = [int(v) for v in args.num_ch.split(',')]
    if args.fc_dims:
        pools['fc_dim_pool'] = [int(v) for v in args.fc_dims.split(',')]
    ds = DeepNets1M(split='train', nets_dir=args.nets_dir,
                    large_images=args.imagenet, seed=args.seed,
                    attach_net=False, **pools)
    stats = simulate(ds, args.draws, args.meta_batch_size, args.patience,
                     imagenet=args.imagenet, seed=args.seed)
    print(json.dumps(stats, indent=1))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(stats, f, indent=1)


if __name__ == '__main__':
    main()
