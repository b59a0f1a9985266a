#!/usr/bin/env python
"""Prediction-based neural architecture search on the DeepNets-1M `search`
split: rank candidate architectures by the accuracy of their GHN-PREDICTED
parameters (a zero-training proxy), then verify the ranking by actually
training a selection of them.

This is the use-case the published dataset ships its `search` split for
(reference eval_ghn.py:20 lists it among the eval splits; the GHN papers use
parameter prediction to rank architectures without training them). Offline
recipe (digits; the RESULTS.md learning-proof checkpoint):

  python scripts/generate_deepnets1m.py --out ./data/dn1m_digits_search -n 1 --val 1 \\
      --search 120 --cells 3,4 --steps 2 --channels 32,64 --fc-dims 128 \\
      --c-mult 2 --fc-layers 1 --glob-avg-p 1.0 --seed 13
  python tools/nas_demo.py --ckpt checkpoints/learning_proof/checkpoint.npz \\
      --nets_dir ./data/dn1m_digits_search --num_search 100

Protocol:
  1. predict parameters for every search candidate (one GHN forward each) and
     score it by predicted-parameter top-1 on the eval images;
  2. select the top-K, middle-K, and bottom-K candidates of that ranking;
  3. train each selected candidate from scratch (He init, identical SGD
     budget) and compare the groups' trained accuracy;
  4. report Spearman rank correlation between the zero-training score and the
     trained accuracy over all selected candidates.

A working GHN ranker shows trained(top-K) > trained(bottom-K) and rho > 0 —
architecture search at ~1000x less compute than training every candidate.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spearman(a, b) -> float:
    """Spearman rank correlation (average ranks for ties)."""
    def ranks(x):
        x = np.asarray(x, dtype=np.float64)
        order = np.argsort(x)
        r = np.empty(len(x))
        r[order] = np.arange(1, len(x) + 1)
        for v in np.unique(x):  # average tied ranks
            m = x == v
            if m.sum() > 1:
                r[m] = r[m].mean()
        return r
    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits_search')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--num_search', type=int, default=100)
    ap.add_argument('--select', type=int, default=5,
                    help='candidates trained per group (top/mid/bottom)')
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.01)
    ap.add_argument('--wd', type=float, default=3e-5)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--num_ch', default='32,64',
                    help='width pool matching the GHN training distribution')
    ap.add_argument('--fc_dims', default='128')
    ap.add_argument('--json', default='results/nas_demo.json')
    ap.add_argument('--out', default=None, help='append a markdown table here')
    ap.add_argument('--platform', default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from ghn3_tpu import GHN3
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.images import image_loader
    from ghn3_tpu.evaluate import he_init_params, predict_and_eval_suite
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.utils.logging import log
    from finetune_proof import finetune

    ghn = GHN3.from_pretrained(args.ckpt)
    data = image_loader(args.dataset, './data', imsize=32, split='val')

    # one deterministic pass over the search split (is_train sampling is
    # seeded; graphs carry their sampled net_args)
    ds = DeepNets1M(split='search', nets_dir=args.nets_dir,
                    num_nets=args.num_search, attach_net=False, seed=args.seed,
                    num_ch_pool=[int(c) for c in args.num_ch.split(',')],
                    fc_dim_pool=[int(c) for c in args.fc_dims.split(',')])
    suite = {}
    for i in range(len(ds)):
        g = ds[i]
        net = Network(is_imagenet_input=False, num_classes=data.num_classes,
                      **g.net_args)
        suite[f'search_{i}'] = (g, net)
    log(f'{len(suite)} search candidates from {args.nets_dir}')

    # 1. zero-training scores: predicted-parameter accuracy
    t0 = time.time()
    rows = predict_and_eval_suite(ghn, suite, data=data,
                                  batch_size=args.batch_size)
    score = {r['arch']: r['top1'] for r in rows}
    t_score = time.time() - t0
    log(f'scored {len(score)} candidates in {t_score:.1f}s '
        f'({t_score / len(score):.2f}s each, zero training)')

    # 2. select top / middle / bottom K of the ranking
    ranked = sorted(score, key=score.get, reverse=True)
    k, mid = args.select, len(ranked) // 2
    groups = {'top': ranked[:k],
              'mid': ranked[mid - k // 2: mid - k // 2 + k],
              'bottom': ranked[-k:]}

    # 3. train the selected candidates from scratch (identical budgets)
    trained = {}
    for gname, names in groups.items():
        for name in names:
            if name in trained:
                continue
            net = suite[name][1]
            i = int(name.rsplit('_', 1)[1])
            p0 = he_init_params(net, seed=1000 + i)
            t0 = time.time()
            marks = finetune(net, p0, data, [args.epochs], args.batch_size,
                             args.lr, args.wd, seed=args.seed + i)
            trained[name] = marks[args.epochs]
            log(f'{gname:6s} {name}: score={score[name]:.2f} '
                f'trained@{args.epochs}ep={trained[name]:.2f} '
                f'({time.time() - t0:.0f}s)')

    # 4. summarize
    group_means = {g: {'score': float(np.mean([score[n] for n in names])),
                       'trained': float(np.mean([trained[n] for n in names]))}
                   for g, names in groups.items()}
    sel = sorted(trained)
    rho = spearman([score[n] for n in sel], [trained[n] for n in sel])
    summary = {
        'ckpt': args.ckpt, 'dataset': args.dataset,
        'num_search': len(suite), 'select_per_group': k,
        'epochs': args.epochs, 'score_sec_per_arch': t_score / len(score),
        'group_means': group_means, 'spearman_rho': rho,
        'scores': {n: score[n] for n in ranked},
        'trained': trained,
    }
    os.makedirs(os.path.dirname(args.json) or '.', exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(summary, f, indent=1)
    log(json.dumps({key: v for key, v in summary.items()
                    if key not in ('scores', 'trained')}, indent=1))

    if args.out:
        lines = ['', '| selection | mean predicted score | mean trained top-1 '
                 f'(+{args.epochs}ep) |', '|---|---|---|']
        for g in ('top', 'mid', 'bottom'):
            lines.append('| %s-%d by GHN score | %.2f | **%.2f** |' % (
                g, k, group_means[g]['score'], group_means[g]['trained']))
        lines.append(f'\nSpearman(score, trained) = **{rho:.3f}** over '
                     f'{len(sel)} trained candidates; scoring cost '
                     f'{t_score / len(score):.2f}s/arch vs training them.')
        with open(args.out, 'a') as f:
            f.write('\n'.join(lines) + '\n')
        log(f'table appended to {args.out}')


if __name__ == '__main__':
    main()
