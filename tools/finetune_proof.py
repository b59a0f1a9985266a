#!/usr/bin/env python
"""Fine-tuning proof: does GHN-predicted initialization beat random init after
a small SGD budget on held-out architectures?

This mirrors the reference's second headline claim — the `ghn3-sgd1ep` /
`ghn3-sgd10ep` vs `randinit-sgd1ep` columns of
/root/reference/ghn3_results.json (ResNet-50: 43.69 vs 18.19 after 1 epoch) and
the GHN-init path of train_ddp.py (trainer.py:128-131: predict, then add
beta=1e-5 noise to break symmetry). Offline recipe (digits, the RESULTS.md
learning-proof checkpoint):

  python tools/finetune_proof.py --ckpt checkpoints/learning_proof/checkpoint.npz \\
      --nets_dir ./data/dn1m_digits --num_nets 32 --epochs 1,10 --out RESULTS.md

For each held-out val architecture both arms run the IDENTICAL SGD recipe
(momentum 0.9, coupled weight decay, cosine schedule over the total budget,
grad clip 5) — the only difference is the initialization:

  ghn3     — predicted parameters + beta=1e-5 noise (reference init semantics)
  randinit — standard He initialization

Both arms train through the buffer-backed bucket programs
(evaluate.finetune_suite_buffered): every architecture in an ArchBucket
fine-tunes inside ONE compiled SGD-step program with the wiring and the
parameter values as data, so a 32-arch x 2-arm sweep costs a handful of
compiles instead of ~64 per-architecture training programs. The buffered
trainer is equivalence-tested against the per-arch Trainer
(tests/test_buffer_eval.py::test_finetune_suite_buffered_matches_trainer).
Prediction goes through the chunked packed path shared with bench.py.
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
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--split', default='val')
    ap.add_argument('--num_nets', type=int, default=32)
    ap.add_argument('--epochs', default='1,10',
                    help='comma-separated epoch marks to evaluate at')
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.01)
    ap.add_argument('--wd', type=float, default=3e-5)
    ap.add_argument('--beta', type=float, default=1e-5,
                    help='symmetry-breaking noise on predicted params '
                         '(reference trainer.py:131)')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--json', default='results/finetune_proof.json')
    ap.add_argument('--out', default=None, help='append a markdown table here')
    ap.add_argument('--platform', default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from ghn3_tpu import GHN3
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.images import image_loader
    from ghn3_tpu.evaluate import (finetune_suite_buffered, he_init_params,
                                   predict_and_eval_suite)
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.utils.cache import enable_persistent_cache
    from ghn3_tpu.utils.logging import log
    from learning_proof import view_params_factory
    enable_persistent_cache()

    epochs_eval = sorted(int(e) for e in args.epochs.split(','))
    ghn = GHN3.from_pretrained(args.ckpt)
    data = image_loader(args.dataset, './data', imsize=32, split='val')
    ds = DeepNets1M(split=args.split, nets_dir=args.nets_dir,
                    num_nets=args.num_nets, attach_net=False)
    suite = {}
    for i in range(len(ds)):
        g = ds[i]
        net = Network(is_imagenet_input=False, num_classes=data.num_classes,
                      **g.net_args)
        suite[f'{args.split}_{i}'] = (g, net)
    log(f'{len(suite)} held-out {args.split} architectures from {args.nets_dir}')

    # predicted init: chunked packed predict, then beta-noise overlay on He
    # init (predicted tensors replace their He counterparts; any tensor the
    # GHN does not predict keeps its He value — reference init semantics)
    t0 = time.time()
    predict_and_eval_suite(ghn, suite, data=None)
    view_params = view_params_factory(suite)
    rng = np.random.default_rng(args.seed)
    ghn_init = {}
    for j, (name, (_g, net)) in enumerate(suite.items()):
        params = {k: np.asarray(v)
                  for k, v in he_init_params(net, seed=args.seed + j).items()}
        for k, v in view_params(name).items():
            params[k] = v + args.beta * rng.standard_normal(v.shape).astype(
                np.float32)
        ghn_init[name] = params
    log(f'predicted inits for {len(suite)} archs in {time.time() - t0:.1f}s')

    recipe = dict(epochs_eval=epochs_eval, batch_size=args.batch_size,
                  lr=args.lr, wd=args.wd, num_classes=data.num_classes,
                  seed=args.seed)
    t0 = time.time()
    ghn_marks = finetune_suite_buffered(ghn.config, suite,
                                        lambda n: ghn_init[n], data, **recipe)
    log(f'ghn3 arm done in {time.time() - t0:.1f}s')
    he = {name: {k: np.asarray(v) for k, v in
                 he_init_params(net, seed=1000 + args.seed + j).items()}
          for j, (name, (_g, net)) in enumerate(suite.items())}
    t0 = time.time()
    rand_marks = finetune_suite_buffered(ghn.config, suite,
                                         lambda n: he[n], data, **recipe)
    log(f'randinit arm done in {time.time() - t0:.1f}s')

    rows = []
    for name, (g, _net) in suite.items():
        rows.append({'arch': name, 'n_nodes': g.n_nodes,
                     'ghn3': {str(e): ghn_marks[name]['marks'][e]
                              for e in epochs_eval},
                     'randinit': {str(e): rand_marks[name]['marks'][e]
                                  for e in epochs_eval}})
    summary = {
        'ckpt': args.ckpt, 'dataset': args.dataset, 'split': args.split,
        'n_archs': len(rows), 'lr': args.lr, 'epochs_eval': epochs_eval,
        'mean_top1': {
            f'ghn3-sgd{e}ep': float(np.mean([r['ghn3'][str(e)] for r in rows]))
            for e in epochs_eval} | {
            f'randinit-sgd{e}ep': float(np.mean([r['randinit'][str(e)]
                                                 for r in rows]))
            for e in epochs_eval},
        'rows': rows,
    }
    os.makedirs(os.path.dirname(args.json) or '.', exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(summary, f, indent=1)
    log(json.dumps({k: v for k, v in summary.items() if k != 'rows'}, indent=1))

    if args.out:
        hdr = ' | '.join(f'ghn3 +{e}ep | randinit +{e}ep' for e in epochs_eval)
        lines = ['', '| arch | %s |' % hdr,
                 '|---|' + '---|' * (2 * len(epochs_eval))]
        for r in rows:
            cells = ' | '.join('**%.2f** | %.2f' % (r['ghn3'][str(e)],
                                                    r['randinit'][str(e)])
                               for e in epochs_eval)
            lines.append('| %s | %s |' % (r['arch'], cells))
        cells = ' | '.join('**%.2f** | %.2f' % (
            summary['mean_top1'][f'ghn3-sgd{e}ep'],
            summary['mean_top1'][f'randinit-sgd{e}ep']) for e in epochs_eval)
        lines.append('| **mean** | %s |' % cells)
        with open(args.out, 'a') as f:
            f.write('\n'.join(lines) + '\n')
        log(f'table appended to {args.out}')


if __name__ == '__main__':
    main()
