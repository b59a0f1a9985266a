#!/usr/bin/env python
"""GHN-3 meta-training (reference train_ghn_ddp.py, SURVEY §3.2).

Examples:
  python cli/train_ghn.py -d synthetic -e 2 -m 4 --hid 32 --layers 2 --ln --weight_norm
  python cli/train_ghn.py -d cifar10 -D ./data --nets_dir ./data -m 8 --hid 64 \\
      --layers 3 --heads 8 --ln --weight_norm --lr 4e-4 --wd 1e-2 \\
      --scheduler cosine-warmup --predparam_wd 3e-5 --amp

Architectures come from DeepNets-1M when its files exist under --nets_dir;
otherwise a synthetic genotype stream is generated. Two executors:

* --executor interpreter (default): the genotype-as-data super-net — FRESH
  architectures every step with one compiled program per static bucket
  (matches the reference's infinite-sampler workload,
  /root/reference/ghn3/deepnets1m.py:282-319, without the per-net retrace).
* --executor pool: one compiled program per meta-batch, cycled across steps
  (round-1 behavior; useful for non-genotype native-spec targets).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.data.images import image_loader
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.parallel.mesh import data_mesh, maybe_init_distributed
from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch
from ghn3_tpu.utils.config import init_config
from ghn3_tpu.utils.logging import log


SYNTH_OPS = ('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect',
             'dil_conv_3x3', 'avg_pool_3x3', 'none')


def synthetic_genotype_stream(args, seed=None):
    """Infinite stream of random genotype GraphDefs (constructive builder, no
    torch, no Network instantiation) for training without DeepNets-1M files."""
    from ghn3_tpu.graph.genotypes import random_genotype
    from ghn3_tpu.nets.darts_graph import build_genotype_graph

    ops = SYNTH_OPS
    rng = np.random.default_rng(args.seed if seed is None else seed)
    widths = (32, 48) if args.dataset != 'synthetic' else (16, 32)
    while True:
        geno = random_genotype(rng, steps=2, ops=ops)
        net_args = dict(genotype=geno, C=int(rng.choice(widths)), n_cells=4,
                        ks=3, preproc=True, C_mult=2, fc_layers=1, fc_dim=0,
                        stem_type=0, stem_pool=False, norm='bn', glob_avg=True,
                        imagenet_stride=4)
        try:
            g = build_genotype_graph(num_classes=args.num_classes,
                                     is_imagenet_input=args.dataset == 'imagenet',
                                     ve_cutoff=max(1, args.virtual_edges),
                                     **net_args)
        except (AssertionError, ValueError):
            continue      # degenerate sample (dead output), like a rejected draw
        g.net_args = net_args
        yield g


def build_interp_stream(args, cfg):
    """Iterator of InterpMetaBatch: DeepNets-1M stream if files exist, else the
    synthetic genotype stream; regrouped into bucket-homogeneous meta-batches."""
    from ghn3_tpu.parallel.meta_executor import (BucketQueue, build_interp_batch,
                                                 stream_interp_batches)
    is_imagenet = args.dataset == 'imagenet'
    h5 = os.path.join(args.nets_dir, 'deepnets1m_train.hdf5')
    if os.path.exists(h5):
        from ghn3_tpu.data.deepnets1m import DeepNets1M, NodeBudgetSampler
        pools = {}
        if getattr(args, 'num_ch', None):
            pools['num_ch_pool'] = [int(v) for v in args.num_ch.split(',')]
        if getattr(args, 'fc_dims', None):
            pools['fc_dim_pool'] = [int(v) for v in args.fc_dims.split(',')]
        ds = DeepNets1M(split='train', nets_dir=args.nets_dir,
                        virtual_edges=args.virtual_edges, num_nets=args.num_nets,
                        large_images=is_imagenet, seed=args.seed, attach_net=False,
                        **pools)
        sampler = NodeBudgetSampler(ds, meta_batch_size=args.meta_batch_size,
                                    seed=args.seed)
        vocab = ds.interpreter_vocab()   # one scan over the stored genotypes
        log(f'interpreter executor: streaming DeepNets-1M ({len(ds)} nets), '
            f'vocab={vocab}')
        pad_buckets = None
        if getattr(args, 'pad_nodes', None):
            pad_buckets = tuple(int(v) for v in args.pad_nodes.split(','))
        return stream_interp_batches(ds, sampler, cfg, args.meta_batch_size,
                                     num_classes=args.num_classes,
                                     is_imagenet_input=is_imagenet,
                                     patience=args.bucket_patience,
                                     vocab=vocab, pad_buckets=pad_buckets,
                                     input_size=args.imsize or 0)

    from ghn3_tpu.nets.interpreter import vocab_from_primitives
    vocab = vocab_from_primitives(SYNTH_OPS)

    def gen():
        queue = BucketQueue(args.meta_batch_size, num_classes=args.num_classes,
                            is_imagenet_input=is_imagenet,
                            patience=args.bucket_patience, vocab=vocab,
                            input_size=args.imsize or 0)
        for g in synthetic_genotype_stream(args):
            group = queue.push(g)
            if group is not None:
                yield build_interp_batch(cfg, group, num_classes=args.num_classes,
                                         is_imagenet_input=is_imagenet, vocab=vocab,
                                         input_size=args.imsize or 0)
    log('interpreter executor: synthetic genotype stream '
        f'(DeepNets-1M files not found at {args.nets_dir})')
    return gen()


def build_arch_pool(args, cfg, pool_size=None):
    pool_size = pool_size or args.pool_size
    """A pool of (meta-batch) compiled-program units to cycle through."""
    h5 = os.path.join(args.nets_dir, 'deepnets1m_train.hdf5')
    pools = []
    if os.path.exists(h5):
        from ghn3_tpu.data.deepnets1m import DeepNets1M, NodeBudgetSampler
        ds = DeepNets1M(split='train', nets_dir=args.nets_dir,
                        virtual_edges=args.virtual_edges, num_nets=args.num_nets,
                        large_images=args.dataset == 'imagenet', seed=args.seed)
        sampler = NodeBudgetSampler(ds, meta_batch_size=args.meta_batch_size, seed=args.seed)
        it = iter(sampler)
        for _ in range(pool_size):
            graphs = [ds[i] for i in next(it)]
            pools.append(build_meta_batch(cfg, GraphBatch.from_graphs(graphs)))
        log(f'architecture pool: {pool_size} meta-batches from DeepNets-1M ({len(ds)} nets)')
    else:
        from ghn3_tpu.nets.simple import ConvNet
        rng = np.random.default_rng(args.seed)
        for _ in range(pool_size):
            nets = []
            for _ in range(args.meta_batch_size):
                depth = int(rng.integers(1, 4))
                chans = tuple(int(rng.choice([8, 16, 32, 48, 64])) for _ in range(depth))
                nets.append(ConvNet(channels=chans, num_classes=args.num_classes,
                                    input_sz=args.imsize))
            graphs = [n.graph_def(ve_cutoff=cfg.ve_cutoff) for n in nets]
            pools.append(build_meta_batch(cfg, GraphBatch.from_graphs(graphs), nets))
        log(f'architecture pool: {pool_size} synthetic meta-batches '
            f'(DeepNets-1M files not found at {args.nets_dir})')
    return pools


def main():
    maybe_init_distributed()
    args = init_config('train_ghn')
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # interpreter bucket warmups are minutes-long

    s = 16 if args.dataset == 'imagenet' else 11
    # GHN-2 recipe (reference train_ghn_ddp.py:57-82): GatedGNN hypernetwork,
    # doubled default max_shape, no predicted-param regularization
    max_shape = args.max_shape or (args.hid * 2 if args.ghn2 else 64)
    if args.ghn2:
        args.predparam_wd = 0.0
    cfg = GHNConfig(hid=args.hid, heads=args.heads, layers=args.layers,
                    max_shape=(max_shape, max_shape, s, s),
                    num_classes=args.num_classes, is_ghn2=args.ghn2,
                    ve=args.virtual_edges > 1, ve_cutoff=max(1, args.virtual_edges),
                    weight_norm=args.weight_norm, layernorm=args.ln,
                    unit_var_norm=getattr(args, 'unit_var_norm', False),
                    dtype='bfloat16' if args.amp else 'float32')
    ghn = GHN3(cfg, seed=args.seed)
    log(f'GHN-3 with {ghn.num_params()} parameters, config: {cfg}')

    data = image_loader(args.dataset, args.data_dir, imsize=args.imsize,
                        aug=args.aug, crop_pct=args.crop_pct,
                        workers=args.num_workers)
    if args.executor == 'interpreter':
        arch_stream = build_interp_stream(args, cfg)
        pool = None
    else:
        pool = build_arch_pool(args, cfg)

    mesh = data_mesh()
    n_batches = max(1, data.num_examples // args.batch_size)
    trainer = Trainer(ghn=ghn, opt=args.opt,
                      opt_args={'lr': args.lr, 'weight_decay': args.wd},
                      scheduler=args.scheduler, n_batches=n_batches,
                      grad_clip=args.grad_clip, label_smoothing=args.label_smoothing,
                      predparam_wd=args.predparam_wd, epochs=args.epochs,
                      save_dir=args.save_dir, bce=args.bce, mixup_fn=args.mixup,
                      log_interval=args.log_interval, mesh=mesh, seed=args.seed)

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    config = {'mode': 'train_ghn', **{k: v for k, v in vars(args).items()
                                      if isinstance(v, (int, float, str, bool, type(None)))}}
    for epoch in range(trainer.start_epoch, args.epochs):
        log(f'epoch {epoch + 1}/{args.epochs}, lr {trainer.get_lr():.2e}')
        trainer._epoch = epoch
        trainer.reset_metrics(epoch)
        for step, (images, labels) in enumerate(
                data.batches(args.batch_size, train=True, seed=args.seed + epoch)):
            if step < trainer.start_step:
                continue
            if args.max_steps is not None and step >= args.max_steps:
                break
            mb = next(arch_stream) if pool is None else \
                pool[(epoch * n_batches + step) % len(pool)]
            trainer.update(images, labels, meta_batch=mb)
            trainer.log(step)
            trainer.save(epoch, step, config, interm_epoch=args.interm_epoch,
                         epoch_freq=1 if epoch >= args.epochs - 1
                         else args.epoch_ckpt_freq)
        trainer.scheduler_step(epoch + 1)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        log(f'profiler trace written to {args.profile}')
    log('done')


if __name__ == '__main__':
    main()
