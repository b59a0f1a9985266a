#!/usr/bin/env python
"""GHN-3 meta-training (reference train_ghn_ddp.py, SURVEY §3.2).

Examples:
  python cli/train_ghn.py -d synthetic -e 2 -m 4 --hid 32 --layers 2 --ln --weight_norm
  python cli/train_ghn.py -d cifar10 -D ./data --nets_dir ./data -m 8 --hid 64 \\
      --layers 3 --heads 8 --ln --weight_norm --lr 4e-4 --wd 1e-2 \\
      --scheduler cosine-warmup --predparam_wd 3e-5 --amp

Architectures come from DeepNets-1M when its files exist under --nets_dir;
otherwise a synthetic pool of native-spec ConvNets is used (each meta-batch is a
compiled program, cycled across steps — see docs/DESIGN.md).
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

    if args.ghn2:
        raise NotImplementedError('GHN-2 (GatedGNN) training is not implemented yet')

    s = 16 if args.dataset == 'imagenet' else 11
    cfg = GHNConfig(hid=args.hid, heads=args.heads, layers=args.layers,
                    max_shape=(args.max_shape, args.max_shape, s, s),
                    num_classes=args.num_classes,
                    ve=args.virtual_edges > 1, ve_cutoff=max(1, args.virtual_edges),
                    weight_norm=args.weight_norm, layernorm=args.ln,
                    dtype='bfloat16' if args.amp else 'float32')
    ghn = GHN3(cfg, seed=args.seed)
    log(f'GHN-3 with {ghn.num_params()} parameters, config: {cfg}')

    data = image_loader(args.dataset, args.data_dir, imsize=args.imsize)
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
            mb = pool[(epoch * n_batches + step) % len(pool)]
            trainer.update(images, labels, meta_batch=mb)
            trainer.log(step)
            trainer.save(epoch, step, config, interm_epoch=args.interm_epoch)
        trainer.scheduler_step(epoch + 1)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        log(f'profiler trace written to {args.profile}')
    log('done')


if __name__ == '__main__':
    main()
