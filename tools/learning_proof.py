#!/usr/bin/env python
"""The end-to-end learning proof: do a meta-trained GHN's predicted parameters
beat random initialization on HELD-OUT architectures?

This is the reference framework's entire value proposition
(/root/reference/ghn3_results.json: `ghn3` vs `randinit-*` columns; recipe
/root/reference/train_ghn_ddp.py:16-22). Offline recipe (RESULTS.md):

  python scripts/generate_deepnets1m.py --out ./data/dn1m_digits -n 3000 --val 64 \\
      --cells 3,4 --steps 2 --channels 32,64 --fc-dims 128 --c-mult 2 \\
      --fc-layers 1 --glob-avg-p 1.0 --seed 7
  python cli/train_ghn.py -d digits --nets_dir ./data/dn1m_digits -m 8 -b 64 \\
      --hid 64 --layers 3 --heads 8 --ln --weight_norm --predparam_wd 3e-5 \\
      -e 400 --num_ch 32,64 --fc_dims 128 --name learning_proof
  python tools/learning_proof.py --ckpt checkpoints/learning_proof/checkpoint.npz \\
      --nets_dir ./data/dn1m_digits --out RESULTS.md

For each held-out architecture (NEVER seen during meta-training) it evaluates
digits-test top-1 under three parameter sources:

  predicted   — the trained GHN's forward pass (one shot, no target training)
  untrained   — an identically-configured GHN with fresh random weights
                (controls for any accuracy a random GHN mapping provides)
  randinit    — standard He initialization (the papers' baseline)

All three arms ride the buffer-backed interpreter programs
(evaluate.eval_suite_buffered): ONE compiled program per ArchBucket with the
architecture wiring AND the parameter values as data, so a 32-arch x 3-arm
split costs a handful of compiles instead of ~100 per-architecture programs
(the per-arch loops made round-3 OOD sweeps take hours through the tunnel).
Parameter prediction itself goes through the chunked packed path shared with
bench.py (persistent-cache hits), which also yields the paramnorm rows.
"""
import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _file_fingerprint(path: str) -> str:
    """Content hash of a checkpoint file, so resume partials can never merge
    rows computed with different weights at the same path."""
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()[:16]


def view_params_factory(suite):
    """name -> {param_name: np.ndarray} from the predicted PackedParams views
    set by predict_and_eval_suite; one host fetch per shared chunk buffer."""
    import jax

    from ghn3_tpu.evaluate import params_dict_from_view
    cache = {}

    def params_of(name):
        view = suite[name][1].predicted
        key = id(view.buffer)
        if key not in cache:
            cache[key] = np.asarray(jax.device_get(view.buffer))
        return params_dict_from_view(view, cache[key])
    return params_of


def eval_arm(label, cfg, suite, params_of, data, batch_size, part, save_part):
    """Evaluate one arm with per-architecture crash resume: each completed row
    lands in ``part['<label>_rows']`` immediately, so a killed run (remote-TPU
    tunnel drops, session recycling, per-split timeouts) re-evaluates only the
    remaining architectures."""
    from ghn3_tpu.evaluate import eval_suite_buffered
    from ghn3_tpu.utils.logging import log

    done = dict(part.get(label + '_rows', {}))
    if done and len(done) < len(suite):
        log(f'{label}: resuming, {len(done)}/{len(suite)} archs already done')

    def on_row(row):
        done[row['arch']] = row
        part[label + '_rows'] = done
        save_part()

    if len(done) < len(suite):
        t0 = time.time()
        eval_suite_buffered(cfg, suite, params_of, data, batch_size=batch_size,
                            num_classes=data.num_classes, skip=set(done),
                            on_row=on_row)
        log(f'{label} arm done in {time.time() - t0:.1f}s')
    part[label + '_rows'] = done
    save_part()
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--nets_dir', default='./data/dn1m_digits')
    ap.add_argument('--dataset', default='digits')
    ap.add_argument('--num_nets', type=int, default=32)
    ap.add_argument('--split', default='val')
    ap.add_argument('--batch_size', type=int, default=128)
    ap.add_argument('--json', default='results/learning_proof.json')
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
    from ghn3_tpu.utils.cache import enable_persistent_cache
    from ghn3_tpu.utils.logging import log
    enable_persistent_cache()

    ghn = GHN3.from_pretrained(args.ckpt)
    log(f'loaded GHN ({ghn.num_params()} params): {ghn.config}')
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

    # Crash resume: each completed row is persisted to <json>.partial so a
    # killed run picks up where it left off. The key includes the checkpoint
    # CONTENT hash and the dataset, so re-training at the same path (or a
    # dataset switch) can never silently merge stale rows into fresh results.
    part_path = args.json + '.partial'
    part_key = {'ckpt': args.ckpt, 'ckpt_sha': _file_fingerprint(args.ckpt),
                'dataset': args.dataset, 'split': args.split,
                'num_nets': args.num_nets, 'nets_dir': args.nets_dir,
                'arms': 'buffered-v2',
                # chunking knob recorded so a resume under a different budget
                # (different compiled programs) can never merge silently
                'chunk_budget': os.environ.get('GHN3_CHUNK_BUDGET', '')}
    part = {'key': part_key}
    if os.path.exists(part_path):
        try:
            with open(part_path) as f:
                prev = json.load(f)
            if prev.get('key') == part_key:
                part = prev
                log(f'resuming from {part_path} '
                    f'(arms done: {sorted(k for k in part if k.endswith("_rows"))})')
            else:
                log(f'{part_path} key mismatch (stale checkpoint/dataset?) — '
                    f'starting fresh')
        except (json.JSONDecodeError, OSError):
            pass

    def save_part():
        os.makedirs(os.path.dirname(part_path) or '.', exist_ok=True)
        tmp = part_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(part, f)
        os.replace(tmp, part_path)

    # ---- predict with the trained GHN (chunked packed path; also the
    # paramnorm/n_nodes metadata source). Re-predicting on resume is cheap
    # (sub-second on chip through the persistent compile cache).
    t0 = time.time()
    meta_rows = {r['arch']: r for r in
                 predict_and_eval_suite(ghn, suite, data=None)}
    log(f'predicted params for {len(suite)} archs in {time.time() - t0:.1f}s')
    predicted = eval_arm('predicted', ghn.config, suite, view_params_factory(suite),
                         data, args.batch_size, part, save_part)

    # ---- control: identical GHN config, fresh random weights
    ghn0 = GHN3(ghn.config, seed=123456)
    predict_and_eval_suite(ghn0, suite, data=None)   # overwrite .predicted views
    untrained = eval_arm('untrained', ghn.config, suite, view_params_factory(suite),
                         data, args.batch_size, part, save_part)

    # ---- baseline: standard He init per architecture
    he = {name: {k: np.asarray(v) for k, v in
                 he_init_params(net, seed=1000 + j).items()}
          for j, (name, (_g, net)) in enumerate(suite.items())}
    randinit = eval_arm('randinit', ghn.config, suite, lambda n: he[n],
                        data, args.batch_size, part, save_part)

    rows = []
    for name in suite:
        rows.append({
            'arch': name,
            'n_nodes': meta_rows[name]['n_nodes'],
            'paramnorm': meta_rows[name]['paramnorm'],
            'top1_predicted': predicted[name]['top1'],
            'top1_untrained_ghn': untrained[name]['top1'],
            'top1_randinit': randinit[name]['top1'],
            'top5_predicted': predicted[name]['top5'],
        })
    summary = {
        'ckpt': args.ckpt,
        'ckpt_sha': part_key['ckpt_sha'],
        'dataset': args.dataset,
        'split': args.split,
        'n_archs': len(rows),
        'mean_top1_predicted': float(np.mean([r['top1_predicted'] for r in rows])),
        'mean_top1_untrained_ghn': float(np.mean([r['top1_untrained_ghn'] for r in rows])),
        'mean_top1_randinit': float(np.mean([r['top1_randinit'] for r in rows])),
        'min_top1_predicted': float(np.min([r['top1_predicted'] for r in rows])),
        'archs_beating_randinit': int(sum(r['top1_predicted'] > r['top1_randinit']
                                          for r in rows)),
        'rows': rows,
    }
    os.makedirs(os.path.dirname(args.json) or '.', exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(summary, f, indent=1)
    if os.path.exists(part_path):
        os.remove(part_path)
    log(json.dumps({k: v for k, v in summary.items() if k != 'rows'}, indent=1))

    if args.out:
        lines = ['', '| arch | nodes | predicted top-1 | untrained-GHN | rand init |',
                 '|---|---|---|---|---|']
        for r in rows:
            lines.append('| %s | %d | **%.2f** | %.2f | %.2f |' % (
                r['arch'], r['n_nodes'], r['top1_predicted'],
                r['top1_untrained_ghn'], r['top1_randinit']))
        lines.append('| **mean** |  | **%.2f** | %.2f | %.2f |' % (
            summary['mean_top1_predicted'], summary['mean_top1_untrained_ghn'],
            summary['mean_top1_randinit']))
        with open(args.out, 'a') as f:
            f.write('\n'.join(lines) + '\n')
        log(f'table appended to {args.out}')


if __name__ == '__main__':
    main()
