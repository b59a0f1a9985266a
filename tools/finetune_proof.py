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
      --nets_dir ./data/dn1m_digits --num_nets 16 --epochs 1,10 --out RESULTS.md

For each held-out val architecture both arms run the IDENTICAL SGD recipe
(momentum 0.9, cosine schedule over the total budget, grad clip 5) — the only
difference is the initialization:

  ghn3     — predicted parameters + beta=1e-5 noise (reference init semantics)
  randinit — standard He initialization
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def predicted_init(ghn, graph, net, seed: int, beta: float = 1e-5):
    """He init overlaid with GHN-predicted tensors + symmetry-breaking noise
    (reference ppuda init(beta=1e-5) at trainer.py:131)."""
    import jax
    from ghn3_tpu.evaluate import he_init_params
    from ghn3_tpu.graph.graphdef import GraphBatch
    from ghn3_tpu.predict import predict_batch

    params = he_init_params(net, seed=seed)
    predict_batch(ghn.params, ghn.config, GraphBatch.from_graphs([graph]),
                  [net.param_table()])
    predicted = dict(net.predicted)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(predicted))
    for k, name in zip(keys, sorted(predicted)):
        predicted[name] = predicted[name] + beta * jax.random.normal(
            k, predicted[name].shape)
    for name in params:
        if name in predicted:
            params[name] = predicted[name]
    return params


def finetune(net, params, data, epochs_eval, batch_size, lr, wd, seed):
    """SGD fine-tune; returns {epoch: top1} at each requested epoch mark."""
    from ghn3_tpu.evaluate import infer
    from ghn3_tpu.parallel.trainer import Trainer

    total_epochs = max(epochs_eval)
    n_batches = max(1, data.num_examples // batch_size)
    trainer = Trainer(model=net, model_params=params, opt='sgd',
                      opt_args={'lr': lr, 'weight_decay': wd, 'momentum': 0.9},
                      scheduler='cosine', n_batches=n_batches,
                      epochs=total_epochs, log_interval=10 ** 9, seed=seed)
    marks = {}
    for epoch in range(total_epochs):
        trainer._epoch = epoch
        trainer.reset_metrics(epoch)
        for images, labels in data.batches(batch_size, train=True,
                                           seed=seed + epoch):
            trainer.update(images, labels)
        trainer.scheduler_step(epoch + 1)
        if (epoch + 1) in epochs_eval:
            top1, _top5 = infer(net, trainer.model_params, data,
                                batch_size=batch_size)
            marks[epoch + 1] = top1
    return marks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--split', default='val')
    ap.add_argument('--num_nets', type=int, default=16)
    ap.add_argument('--epochs', default='1,10',
                    help='comma-separated epoch marks to evaluate at')
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--lr', type=float, default=0.01)
    ap.add_argument('--wd', type=float, default=3e-5)
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
    from ghn3_tpu.evaluate import he_init_params
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.utils.logging import log

    epochs_eval = sorted(int(e) for e in args.epochs.split(','))
    ghn = GHN3.from_pretrained(args.ckpt)
    data = image_loader(args.dataset, './data', imsize=32, split='val')
    ds = DeepNets1M(split=args.split, nets_dir=args.nets_dir,
                    num_nets=args.num_nets, attach_net=False)

    rows = []
    for i in range(len(ds)):
        g = ds[i]
        net = Network(is_imagenet_input=False, num_classes=data.num_classes,
                      **g.net_args)
        t0 = time.time()
        p_ghn = predicted_init(ghn, g, net, seed=args.seed + i)
        ghn_marks = finetune(net, p_ghn, data, epochs_eval, args.batch_size,
                             args.lr, args.wd, seed=args.seed + i)
        p_rand = he_init_params(net, seed=1000 + args.seed + i)
        rand_marks = finetune(net, p_rand, data, epochs_eval, args.batch_size,
                              args.lr, args.wd, seed=args.seed + i)
        row = {'arch': f'{args.split}_{i}', 'n_nodes': g.n_nodes,
               'ghn3': {str(e): ghn_marks[e] for e in epochs_eval},
               'randinit': {str(e): rand_marks[e] for e in epochs_eval}}
        rows.append(row)
        log('%s (%.0fs): ' % (row['arch'], time.time() - t0) +
            ' '.join('ep%d ghn3=%.2f rand=%.2f' % (e, ghn_marks[e], rand_marks[e])
                     for e in epochs_eval))

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
