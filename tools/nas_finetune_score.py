#!/usr/bin/env python
"""NAS ranking by GHN-init + 1 SGD epoch — the `sgd1ep` column as a search
proxy (reference ghn3_results.json publishes ghn3-sgd1ep exactly because one
epoch from GHN init is the cheap, strong signal; eval_ghn.py:20 ships the
`search` split for prediction-based NAS).

tools/nas_demo.py measured the zero-training proxy (predicted-parameter CE)
on 100 search candidates and trained ALL of them for the ground truth: the
zero-cost score separates the decile tails but cannot order the saturated
middle (rho ~0.17, RESULTS.md). This tool measures the next rung of the
cost/fidelity ladder on the SAME candidates against the SAME committed ground
truth (results/nas_demo.json + results/nas_demo_seed1.json, seed-averaged):

  score := val top-1 / negative CE after fine-tuning each candidate for ONE
  epoch from its GHN-predicted initialization, through the buffer-backed
  bucket programs (evaluate.finetune_suite_buffered — whole-bucket SGD in one
  compiled step, so 100 one-epoch fine-tunes cost seconds of chip time, not
  hours; this throughput is what makes the proxy practical).

Candidate-identity guard: the search split is regenerated deterministically
(scripts/generate_deepnets1m.py --seed 13, docstring of tools/nas_demo.py) and
the recomputed zero-training scores are cross-checked against the committed
`scores` dict — a mismatch means the suite is NOT the one the ground truth
was trained on, and the tool aborts rather than report a bogus correlation.

  python scripts/generate_deepnets1m.py --out ./data/dn1m_digits_search -n 1 \
      --val 1 --search 120 --cells 3,4 --steps 2 --channels 32,64 \
      --fc-dims 128 --c-mult 2 --fc-layers 1 --glob-avg-p 1.0 --seed 13
  python tools/nas_finetune_score.py --ckpt checkpoints/learning_proof/checkpoint.npz
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nas_demo import spearman, spearman_ci


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits_search')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--num_search', type=int, default=100)
    ap.add_argument('--select', type=int, default=10)
    ap.add_argument('--ft_epochs', type=int, default=1)
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.01)
    ap.add_argument('--wd', type=float, default=3e-5)
    ap.add_argument('--seed', type=int, default=0,
                    help='candidate-sampling seed; must equal the nas_demo '
                         'runs that produced the ground truth')
    ap.add_argument('--truth', nargs='+',
                    default=['results/nas_demo.json',
                             'results/nas_demo_seed1.json'],
                    help='committed nas_demo outputs; trained top-1 is '
                         'averaged across them (independent training seeds)')
    ap.add_argument('--num_ch', default='32,64')
    ap.add_argument('--fc_dims', default='128')
    ap.add_argument('--json', default='results/nas_finetune_score.json')
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
                                   predict_and_eval_suite)
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.utils.cache import enable_persistent_cache
    from ghn3_tpu.utils.logging import log
    from learning_proof import view_params_factory
    enable_persistent_cache()

    # ground truth: per-candidate 10-epoch from-scratch top-1, seed-averaged
    truths, zero_scores_committed, truth_epochs = [], None, None
    for p in args.truth:
        with open(p) as f:
            o = json.load(f)
        truths.append(o['trained'])
        truth_epochs = truth_epochs or o.get('epochs')
        if zero_scores_committed is None and 'scores' in o:
            zero_scores_committed = o['scores']
    names_truth = sorted(truths[0])
    truth = {n: float(np.mean([t[n] for t in truths])) for n in names_truth}

    ghn = GHN3.from_pretrained(args.ckpt)
    data = image_loader(args.dataset, './data', imsize=32, split='val')

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
    missing = [n for n in names_truth if n not in suite]
    if missing:
        raise SystemExit(f'suite does not cover the ground truth: {missing[:5]}')
    log(f'{len(suite)} search candidates; ground truth = mean over '
        f'{len(truths)} training seeds at {truth_epochs} epochs')

    # predict params for every candidate + recompute the zero-training score
    t0 = time.time()
    predict_and_eval_suite(ghn, suite, data=None)
    params_of = view_params_factory(suite)
    scored0 = eval_suite_buffered(ghn.config, suite, params_of, data,
                                  batch_size=args.batch_size,
                                  num_classes=data.num_classes)
    zero_score = {n: -r['loss'] for n, r in scored0.items()}
    t_zero = time.time() - t0

    # candidate-identity guard vs the committed run
    if zero_scores_committed:
        a = np.array([zero_score[n] for n in names_truth])
        b = np.array([float(zero_scores_committed[n]) for n in names_truth])
        drift = float(np.max(np.abs(a - b)))
        ident_rho = spearman(a, b)
        log(f'zero-score identity check: max |drift|={drift:.2e}, '
            f'rank corr={ident_rho:.4f}')
        if ident_rho < 0.999:
            raise SystemExit('regenerated search split does not reproduce the '
                             'committed zero-training scores — candidates '
                             'differ from the trained ground truth; aborting')

    # the proxy under test: ONE SGD epoch from the GHN-predicted init
    t0 = time.time()
    ft = finetune_suite_buffered(ghn.config, suite, params_of, data,
                                 epochs_eval=[args.ft_epochs],
                                 batch_size=args.batch_size, lr=args.lr,
                                 wd=args.wd, num_classes=data.num_classes,
                                 seed=args.seed)
    # continuous score: negative CE of the fine-tuned params (top-1 kept too)
    final_params = {n: r['params'] for n, r in ft.items()}
    scored1 = eval_suite_buffered(ghn.config, suite,
                                  lambda n: final_params[n], data,
                                  batch_size=args.batch_size,
                                  num_classes=data.num_classes)
    ft_score = {n: -r['loss'] for n, r in scored1.items()}
    ft_top1 = {n: r['top1'] for n, r in scored1.items()}
    t_ft = time.time() - t0
    log(f'fine-tuned {len(ft)} candidates for {args.ft_epochs} epoch(s) in '
        f'{t_ft:.1f}s ({t_ft / len(ft):.2f}s each incl. scoring)')

    b = [truth[n] for n in names_truth]
    rho_zero = spearman([zero_score[n] for n in names_truth], b)
    rho_ft = spearman([ft_score[n] for n in names_truth], b)
    lo, hi = spearman_ci([ft_score[n] for n in names_truth], b, seed=args.seed)
    rho_ft_top1 = spearman([ft_top1[n] for n in names_truth], b)

    ranked = sorted(ft_score, key=ft_score.get, reverse=True)
    k, mid = args.select, len(ranked) // 2
    groups = {'top': ranked[:k],
              'mid': ranked[mid - k // 2: mid - k // 2 + k],
              'bottom': ranked[-k:]}
    group_means = {g: {'ft_score': float(np.mean([ft_score[n] for n in ns])),
                       'trained': float(np.mean([truth[n] for n in ns]))}
                   for g, ns in groups.items()}

    summary = {
        'ckpt': args.ckpt, 'dataset': args.dataset,
        'num_search': len(suite), 'select_per_group': k,
        'ft_epochs': args.ft_epochs, 'truth_epochs': truth_epochs,
        'truth_files': args.truth, 'score_metric': 'neg_cross_entropy_after_ft',
        'zero_sec_per_arch': t_zero / len(suite),
        'ft_sec_per_arch': t_ft / len(suite),
        'spearman_rho_zero': rho_zero, 'spearman_rho_ft': rho_ft,
        'spearman_ft_ci95': [lo, hi], 'spearman_rho_ft_top1': rho_ft_top1,
        'group_means': group_means, 'n_trained': len(names_truth),
        'ft_scores': {n: ft_score[n] for n in ranked},
        'ft_top1': ft_top1,
    }
    os.makedirs(os.path.dirname(args.json) or '.', exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(summary, f, indent=1)
    log(json.dumps({key: v for key, v in summary.items()
                    if key not in ('ft_scores', 'ft_top1')}, indent=1))

    if args.out:
        lines = ['', f'| selection by 1-epoch fine-tune score | mean trained '
                 f'top-1 (+{truth_epochs}ep, seed-avg) |', '|---|---|']
        for g in ('top', 'mid', 'bottom'):
            lines.append('| %s-%d | **%.2f** |' % (g, k,
                                                   group_means[g]['trained']))
        lines.append(f'\nSpearman(ft-score, trained) = **{rho_ft:.3f}** '
                     f'(95% CI [{lo:.3f}, {hi:.3f}]) vs {rho_zero:.3f} for '
                     f'the zero-training score, n={len(names_truth)}; '
                     f'fine-tune cost {t_ft / len(ft):.2f}s/arch.')
        with open(args.out, 'a') as f:
            f.write('\n'.join(lines) + '\n')


if __name__ == '__main__':
    main()
