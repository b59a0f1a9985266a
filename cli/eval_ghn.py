#!/usr/bin/env python
"""GHN evaluation sweep: predict parameters for a suite of architectures, check
parameter norms against published metadata, and measure top-1/top-5 with the
running-stat-free BN protocol (reference eval_ghn.py, SURVEY §3.4).

Examples:
  python cli/eval_ghn.py --ckpt ghn3tm8.npz --split torch -d synthetic
  python cli/eval_ghn.py --ckpt ghn3xlm16.npz --split torch -d imagenet -D /data/imagenet
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ghn3_tpu import GHN3
from ghn3_tpu.data.images import image_loader
from ghn3_tpu.evaluate import predict_and_eval_suite
from ghn3_tpu.utils.config import init_config
from ghn3_tpu.utils.logging import log


def torch_suite(args, ghn):
    """(graph builder, functional twin) pairs for the torch-zoo architectures."""
    from ghn3_tpu.evaluate import adjust_net_f
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.torch_interop import adjust_net
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
    suite = {}
    cutoff = ghn.config.ve_cutoff if ghn.config.ve else 1
    small = args.dataset.startswith('cifar')
    # canonical (1000-class, unadjusted) graphs come from the shared disk cache
    cacheable = args.num_classes == 1000 and not small
    names = [args.arch] if args.arch in JAX_ZOO else list(JAX_ZOO)
    if args.num_nets:   # cap the sweep (reference -n semantics, handy for smokes)
        names = sorted(names)[:args.num_nets]
    for name in names:
        twin = JAX_ZOO[name](num_classes=args.num_classes)
        if small:   # reference eval_ghn.py:145 adjust_net for 32px inputs
            twin = adjust_net_f(twin)

        def build(name=name):
            tm = TORCH_ZOO[name](num_classes=args.num_classes)
            if small:
                tm = adjust_net(tm)
            return trace_torch_model(tm, ve_cutoff=cutoff)

        if cacheable:
            from ghn3_tpu.graph.cache import cached_graph
            suite[name] = ((lambda name=name, build=build:
                            cached_graph(name, build, ve_cutoff=cutoff)), twin)
        else:
            suite[name] = (build, twin)
    return suite


def deepnets_suite(args, ghn):
    if args.split == 'predefined':
        from ghn3_tpu.nets.predefined import build_predefined, predefined_nets
        cutoff = ghn.config.ve_cutoff if ghn.config.ve else 1
        suite = {}
        for name in predefined_nets(args.dataset == 'imagenet'):
            builder, fnet = build_predefined(name, num_classes=args.num_classes,
                                             is_imagenet_input=args.dataset == 'imagenet')
            suite[name] = (lambda b=builder: b(ve_cutoff=cutoff), fnet)
        return suite

    from ghn3_tpu.data.deepnets1m import DeepNets1M
    ds = DeepNets1M(split=args.split, nets_dir=args.nets_dir,
                    virtual_edges=args.virtual_edges,
                    num_nets=args.num_nets or 10,
                    large_images=args.dataset == 'imagenet')
    from ghn3_tpu.nets.darts import Network
    suite = {}
    for i in range(len(ds)):
        g = ds[i]
        net = Network(is_imagenet_input=args.dataset == 'imagenet',
                      num_classes=args.num_classes, **g.net_args)
        suite[f'{args.split}_{i}'] = (g, net)
    return suite


def _file_fingerprint(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()[:16]


def main():
    args = init_config('eval')
    assert args.ckpt, '--ckpt is required'
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # zoo sweeps compile ~60 XL predict programs
                                # + one forward per twin; cache across runs
    if args.ckpt.startswith('random:'):
        # reproducible random-weight GHN for full-scale pipeline sweeps in
        # environments where the published checkpoints cannot be fetched,
        # e.g. --ckpt random:ghn3_xl (seed via random:ghn3_xl@7; default 0)
        from ghn3_tpu import GHNConfig
        spec, _, seed = args.ckpt[len('random:'):].partition('@')
        cfg = getattr(GHNConfig, spec)()
        if args.num_classes != cfg.num_classes:
            import dataclasses
            cfg = dataclasses.replace(cfg, num_classes=args.num_classes)
        ghn = GHN3(cfg, seed=int(seed or 0))
    else:
        ghn = GHN3.from_pretrained(args.ckpt)
    log(f'loaded GHN with {ghn.num_params()} params: {ghn.config}')

    if args.split == 'torch':
        suite = torch_suite(args, ghn)
    else:
        suite = deepnets_suite(args, ghn)

    data = None
    data_by_imsize = {}
    try:
        data = image_loader(args.dataset, args.data_dir, imsize=args.imsize, split='val',
                            noise=args.noise, crop_pct=args.crop_pct)
        # Inception expects 299px inputs: build a dedicated loader like the
        # reference does (eval_ghn.py im_size=299 branch)
        sizes = {getattr(net, 'expected_input_sz', 224) for _, net in suite.values()}
        for sz in sorted(sizes - {args.imsize}):
            try:
                data_by_imsize[sz] = image_loader(
                    args.dataset, args.data_dir, imsize=sz, split='val',
                    noise=args.noise, crop_pct=args.crop_pct)
            except (FileNotFoundError, NotImplementedError):
                pass
    except (FileNotFoundError, NotImplementedError) as e:
        log(f'no eval data available ({e}); running norm checks only')

    meta_name = None
    if args.ckpt.find('xlm16') >= 0:
        meta_name = 'ghn3xlm16.pt'
    elif args.ckpt.find('tm8') >= 0:
        meta_name = 'ghn3tm8.pt'
    elif args.ckpt.find('ghn2') >= 0:
        meta_name = 'ghn2.pt'

    # Per-architecture crash resume (hour-scale sweeps through a tunnel-
    # attached chip get killed; the reference's GPU sweep restarts from
    # scratch, eval_ghn.py:73-188). Completed rows persist to a .partial file
    # keyed by checkpoint CONTENT hash + suite knobs so stale rows can never
    # silently merge into fresh results (same scheme as tools/learning_proof).
    part_path = part = None
    done = {}
    if args.save_dir:
        part_path = os.path.join(args.save_dir, 'eval_results.json.partial')
        ckpt_sha = (args.ckpt if args.ckpt.startswith('random:')
                    else _file_fingerprint(args.ckpt))
        part_key = {'ckpt': args.ckpt, 'ckpt_sha': ckpt_sha,
                    'dataset': args.dataset, 'split': args.split,
                    'num_nets': args.num_nets, 'num_classes': args.num_classes,
                    'chunk_budget': os.environ.get('GHN3_CHUNK_BUDGET', '')}
        part = {'key': part_key, 'rows': {}}
        if os.path.exists(part_path):
            try:
                with open(part_path) as f:
                    prev = json.load(f)
                if prev.get('key') == part_key:
                    part = prev
                    done = dict(part['rows'])
                    log(f'resuming: {len(done)}/{len(suite)} archs already done')
                else:
                    log(f'{part_path} key mismatch — starting fresh')
            except (json.JSONDecodeError, OSError):
                pass

    def on_row(row):
        if part is None:
            return
        part['rows'][row['arch']] = row
        tmp = part_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(part, f)
        os.replace(tmp, part_path)

    results = predict_and_eval_suite(ghn, suite, data=data,
                                     batch_size=args.val_batch_size,
                                     metadata_name=meta_name,
                                     data_by_imsize=data_by_imsize,
                                     on_row=on_row, skip=set(done))
    results = list(done.values()) + results

    if args.save_ckpt:
        # export predicted weights per architecture (reference --save_ckpt)
        import jax
        os.makedirs(args.save_ckpt, exist_ok=True)
        for name, (_, net) in suite.items():
            params = {k: np.asarray(v) for k, v in
                      zip(net.predicted.keys(),
                          jax.device_get([net.predicted[k] for k in net.predicted.keys()]))}
            out = os.path.join(args.save_ckpt, f'{name}_predicted.npz')
            np.savez(out, **params)
            log(f'saved predicted params to {out}')
    if 'top1' in results[0]:
        top1 = [r['top1'] for r in results]
        log(f'\navg top1: {np.mean(top1):.2f} +- {np.std(top1):.2f} over {len(top1)} archs')
    if args.save_dir:
        out = os.path.join(args.save_dir, 'eval_results.json')
        with open(out, 'w') as f:
            json.dump(results, f, indent=1)
        log(f'wrote {out}')


if __name__ == '__main__':
    main()
