"""Experiment configuration / CLI flag system.

Replaces the ppuda `init_config` surface (SURVEY §2.9) with the same knob
vocabulary: dataset/data paths, GHN architecture flags, optimization flags,
eval flags, experiment-dir + checkpoint naming, seeding.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def base_parser(mode: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f'ghn3_tpu ({mode})')
    p.add_argument('-d', '--dataset', type=str, default='cifar10',
                   choices=['cifar10', 'imagenet', 'synthetic', 'digits'])
    p.add_argument('-D', '--data_dir', type=str, default='./data')
    p.add_argument('--nets_dir', type=str, default='./data',
                   help='directory with DeepNets-1M files')
    p.add_argument('-e', '--epochs', type=int, default=75 if mode == 'train_ghn' else 50)
    p.add_argument('-b', '--batch_size', type=int, default=128)
    p.add_argument('--val_batch_size', type=int, default=64)
    p.add_argument('-i', '--imsize', type=int, default=None)
    p.add_argument('--seed', type=int, default=1111)
    p.add_argument('--name', type=str, default=None, help='experiment name')
    p.add_argument('--save', type=str, default='./checkpoints',
                   help='experiment root dir ("" to disable saving)')
    p.add_argument('--ckpt', type=str, default=None,
                   help='checkpoint to load (GHN for init, or resume file)')
    p.add_argument('--num_workers', type=int, default=4)
    p.add_argument('--debug', type=int, default=0)
    p.add_argument('--amp', action='store_true', help='bfloat16 graphormer compute')
    p.add_argument('--compile', type=str, default=None, help='unused (jit is always on)')
    p.add_argument('--platform', type=str, default=None, choices=[None, 'cpu', 'tpu', 'axon'],
                   help='force a JAX platform (e.g. cpu for smoke tests)')
    p.add_argument('--num_devices', type=int, default=None,
                   help='virtual device count when --platform cpu')
    p.add_argument('--max_steps', type=int, default=None,
                   help='cap steps per epoch (smoke tests)')
    p.add_argument('--crop_pct', type=float, default=0.875,
                   help='eval center-crop ratio (0.95 for the A3 recipe)')
    p.add_argument('--profile', type=str, default=None,
                   help='write a jax.profiler trace to this directory')

    if mode in ('train_ghn', 'eval'):
        p.add_argument('-v', '--virtual_edges', type=int, default=50)
        p.add_argument('--ln', action='store_true', help='layernorm on node embeddings')
        p.add_argument('--hid', type=int, default=64)
        p.add_argument('--layers', type=int, default=3)
        p.add_argument('--heads', type=int, default=8)
        p.add_argument('--max_shape', type=int, default=None,
                       help='decoder canonical channel size (default 64; '
                            'hid*2 for --ghn2, matching the reference)')
        p.add_argument('--weight_norm', action='store_true')
        p.add_argument('--unit_var_norm', action='store_true',
                       help='off-protocol: RMS-normalize decoded tensors to '
                            'exactly-He scale before the fan-in rescale '
                            '(norm-free-net rescue; see RESULTS.md bnfree '
                            'positive control)')
        p.add_argument('--hypernet', type=str, default='graphormer')
        p.add_argument('--decoder', type=str, default='conv')
        p.add_argument('-m', '--meta_batch_size', type=int, default=1)
        p.add_argument('-n', '--num_nets', type=int, default=None)
        p.add_argument('--ghn2', action='store_true', help='GHN-2 baseline mode')
        p.add_argument('--pool_size', type=int, default=8,
                       help='architecture-pool size (one compiled program per '
                            'meta-batch; lower = less compile time; '
                            '--executor pool only)')
        p.add_argument('--executor', type=str, default='interpreter',
                       choices=['interpreter', 'pool'],
                       help='interpreter: genotype-as-data super-net, fresh '
                            'architectures every step, one compiled program per '
                            'bucket (the reference workload); pool: one compiled '
                            'program per meta-batch, cycled')
        p.add_argument('--bucket_patience', type=int, default=None,
                       help='flush a partially-filled bucket after this many '
                            'streamed nets (interpreter executor; default: '
                            'adaptive to the active bucket count)')
        p.add_argument('--num_ch', type=str, default=None,
                       help='comma-separated channel-width pool override for '
                            'the wider_nets sampling (bounds interpreter '
                            'bucket cardinality; default 32..128 step 16)')
        p.add_argument('--fc_dims', type=str, default=None,
                       help='comma-separated fc_dim pool override '
                            '(default 64..512 step 64)')
        p.add_argument('--pad_nodes', type=str, default=None,
                       help='comma-separated node-padding bucket sizes for the '
                            'interpreter executor (fewer sizes = fewer compiled '
                            'programs; default: graphdef.DEFAULT_BUCKETS)')
    if mode in ('train_ghn', 'train_net'):
        p.add_argument('--opt', type=str, default='adamw' if mode == 'train_ghn' else 'sgd')
        p.add_argument('--lr', type=float, default=4e-4 if mode == 'train_ghn' else 0.1)
        p.add_argument('--wd', type=float, default=1e-2 if mode == 'train_ghn' else 5e-5)
        p.add_argument('--momentum', type=float, default=0.9)
        p.add_argument('--scheduler', type=str,
                       default='cosine-warmup' if mode == 'train_ghn' else 'cosine')
        p.add_argument('--grad_clip', type=float, default=5.0)
        p.add_argument('--label_smoothing', type=float, default=0.0)
        p.add_argument('--bce', action='store_true')
        p.add_argument('--mixup', action='store_true')
        p.add_argument('--aug', type=str, default=None,
                       help="RandAugment spec, e.g. 'rand-m6-mstd0.5' (A3 recipe)")
        p.add_argument('--predparam_wd', type=float, default=0.0)
        p.add_argument('--interm_epoch', type=int, default=5)
        p.add_argument('--epoch_ckpt_freq', type=int, default=1,
                       help='write the epoch-end resume checkpoint only every '
                            'N epochs (always on the final epoch); cuts IO for '
                            'large GHNs with short epochs')
        p.add_argument('--log_interval', type=int, default=100)
    if mode in ('train_net', 'eval'):
        # eval defaults to sweeping the whole suite (reference eval_ghn behavior)
        p.add_argument('--arch', type=str,
                       default='resnet50' if mode == 'train_net' else None)
        p.add_argument('--split', type=str, default='torch',
                       choices=['torch', 'predefined', 'search', 'val', 'test',
                                'wide', 'deep', 'dense', 'bnfree'])
        p.add_argument('--noise', action='store_true')
        p.add_argument('--save_ckpt', type=str, default=None)
        p.add_argument('--num_classes', type=int, default=None,
                       help='override the dataset-implied class count (e.g. '
                            'sweep the zoo at its canonical 1000-class '
                            'geometry over synthetic inputs)')
    return p


def init_config(mode: str = 'train_ghn', parser: Optional[argparse.ArgumentParser] = None,
                argv=None):
    """Parse flags, seed numpy, and compute the experiment directory."""
    p = parser or base_parser(mode)
    args = p.parse_args(argv)
    args.mode = mode

    if args.platform:
        import jax
        if args.num_devices and args.platform == 'cpu':
            try:
                jax.config.update('jax_num_cpu_devices', args.num_devices)
            except Exception:
                pass
        jax.config.update('jax_platforms', args.platform)

    # record whether the user pinned -i/--imsize BEFORE defaulting it, so
    # arch-specific defaults (inception 299px, reference eval.py) can apply
    args.imsize_explicit = args.imsize is not None
    if args.imsize is None:
        args.imsize = 224 if args.dataset == 'imagenet' else 32
    implied = {'imagenet': 1000, 'cifar10': 10, 'synthetic': 10,
               'digits': 10}[args.dataset]
    if getattr(args, 'num_classes', None) is None:
        args.num_classes = implied
    elif args.num_classes != implied and args.dataset != 'synthetic':
        raise ValueError(f'--num_classes {args.num_classes} conflicts with '
                         f'{args.dataset} ({implied} classes); the override '
                         'is for synthetic inputs only')

    np.random.seed(args.seed)

    if args.save:
        name = args.name or f'{mode}-{args.dataset}-{time.strftime("%Y%m%d-%H%M%S")}'
        args.save_dir = os.path.join(args.save, name)
        os.makedirs(args.save_dir, exist_ok=True)
    else:
        args.save_dir = None
    return args
