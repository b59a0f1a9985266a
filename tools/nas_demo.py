#!/usr/bin/env python
"""Prediction-based neural architecture search on the DeepNets-1M `search`
split: rank candidate architectures by the accuracy of their GHN-PREDICTED
parameters (a zero-training proxy), then verify the ranking by actually
training the candidates.

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
  1. predict parameters for every search candidate (chunked packed predict)
     and score it by predicted-parameter top-1 on the eval images through the
     buffer-backed bucket programs (evaluate.eval_suite_buffered);
  2. train EVERY candidate from scratch (He init, identical SGD budget)
     through the same bucket programs (evaluate.finetune_suite_buffered) —
     whole-population ground truth, not a sampled subset: one compiled SGD
     step per ArchBucket makes n=100 trainings as cheap as a handful used
     to be;
  3. report Spearman rank correlation (with a bootstrap 95% CI) between the
     zero-training score and the trained accuracy, plus top/mid/bottom-K
     group means of the GHN ranking.

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


def spearman_ci(a, b, n_boot: int = 10000, seed: int = 0, alpha: float = 0.05):
    """Percentile bootstrap confidence interval for the Spearman rho."""
    a, b = np.asarray(a), np.asarray(b)
    rng = np.random.default_rng(seed)
    n = len(a)
    boots = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.integers(0, n, n)
        boots[i] = spearman(a[idx], b[idx])
    lo, hi = np.percentile(boots, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits_search')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--num_search', type=int, default=100)
    ap.add_argument('--select', type=int, default=10,
                    help='K for the top/mid/bottom group summary')
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.01)
    ap.add_argument('--wd', type=float, default=3e-5)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--train_seed', type=int, default=0,
                    help='seed for the ground-truth training arm only (He '
                         'init + batch order); candidate sampling stays on '
                         '--seed, so two runs differing only here measure '
                         'the seed-noise ceiling of the ranking target')
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
    from ghn3_tpu.evaluate import (eval_suite_buffered, finetune_suite_buffered,
                                   he_init_params, predict_and_eval_suite)
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.utils.cache import enable_persistent_cache
    from ghn3_tpu.utils.logging import log
    from learning_proof import view_params_factory
    enable_persistent_cache()

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

    # 1. zero-training scores: predicted-parameter accuracy (packed predict +
    # buffered bucket eval — both wiring and values ride as data)
    t0 = time.time()
    predict_and_eval_suite(ghn, suite, data=None)
    scored = eval_suite_buffered(ghn.config, suite, view_params_factory(suite),
                                 data, batch_size=args.batch_size,
                                 num_classes=data.num_classes)
    # primary score = negative cross-entropy of the predicted-param logits:
    # continuous, so it keeps rank resolution where top-1 saturates (digits
    # predictions cluster at 94-99% top-1, collapsing accuracy ranks to ties);
    # top-1 is kept and reported alongside
    score = {n: -r['loss'] for n, r in scored.items()}
    score_top1 = {n: r['top1'] for n, r in scored.items()}
    t_score = time.time() - t0
    log(f'scored {len(score)} candidates in {t_score:.1f}s '
        f'({t_score / len(score):.2f}s each, zero training)')

    # 2. whole-population ground truth: train every candidate from He init
    he = {name: {k: np.asarray(v) for k, v in
                 he_init_params(net,
                                seed=1000 + j + 10000 * args.train_seed).items()}
          for j, (name, (_g, net)) in enumerate(suite.items())}
    t0 = time.time()
    ft = finetune_suite_buffered(ghn.config, suite, lambda n: he[n], data,
                                 epochs_eval=[args.epochs],
                                 batch_size=args.batch_size, lr=args.lr,
                                 wd=args.wd, num_classes=data.num_classes,
                                 seed=args.seed + 7777 * args.train_seed)
    trained = {n: r['marks'][args.epochs] for n, r in ft.items()}
    t_train = time.time() - t0
    log(f'trained all {len(trained)} candidates for {args.epochs} epochs in '
        f'{t_train:.1f}s ({t_train / len(trained):.1f}s each)')

    # 3. summarize: groups of the GHN ranking + whole-population correlation
    ranked = sorted(score, key=score.get, reverse=True)
    k, mid = args.select, len(ranked) // 2
    groups = {'top': ranked[:k],
              'mid': ranked[mid - k // 2: mid - k // 2 + k],
              'bottom': ranked[-k:]}
    group_means = {g: {'score': float(np.mean([score[n] for n in names])),
                       'trained': float(np.mean([trained[n] for n in names]))}
                   for g, names in groups.items()}
    sel = sorted(trained)
    a = [score[n] for n in sel]
    b = [trained[n] for n in sel]
    rho = spearman(a, b)
    lo, hi = spearman_ci(a, b, seed=args.seed)
    rho_top1 = spearman([score_top1[n] for n in sel], b)
    summary = {
        'ckpt': args.ckpt, 'dataset': args.dataset,
        'num_search': len(suite), 'select_per_group': k,
        'epochs': args.epochs, 'score_sec_per_arch': t_score / len(score),
        'train_sec_per_arch': t_train / len(trained),
        'score_metric': 'neg_cross_entropy', 'train_seed': args.train_seed,
        'group_means': group_means, 'spearman_rho': rho,
        'spearman_ci95': [lo, hi], 'spearman_rho_top1_score': rho_top1,
        'n_trained': len(sel),
        'scores': {n: score[n] for n in ranked},
        'scores_top1': {n: score_top1[n] for n in ranked},
        'trained': trained,
    }
    os.makedirs(os.path.dirname(args.json) or '.', exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(summary, f, indent=1)
    log(json.dumps({key: v for key, v in summary.items()
                    if key not in ('scores', 'trained')}, indent=1))

    if args.out:
        lines = ['', '| selection | mean predicted score (-CE) | mean trained '
                 f'top-1 (+{args.epochs}ep) |', '|---|---|---|']
        for g in ('top', 'mid', 'bottom'):
            lines.append('| %s-%d by GHN score | %.2f | **%.2f** |' % (
                g, k, group_means[g]['score'], group_means[g]['trained']))
        lines.append(f'\nSpearman(score, trained) = **{rho:.3f}** '
                     f'(95% CI [{lo:.3f}, {hi:.3f}]) over ALL {len(sel)} '
                     f'candidates trained; scoring cost '
                     f'{t_score / len(score):.2f}s/arch vs '
                     f'{t_train / len(trained):.1f}s/arch to train.')
        with open(args.out, 'a') as f:
            f.write('\n'.join(lines) + '\n')
        log(f'table appended to {args.out}')


if __name__ == '__main__':
    main()
