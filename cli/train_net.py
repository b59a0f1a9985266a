#!/usr/bin/env python
"""Target-network training, from scratch or from GHN-3 predicted initialization
(reference train_ddp.py, SURVEY §3.3).

Examples:
  python cli/train_net.py -d synthetic --arch convnet -e 2 --lr 0.1
  python cli/train_net.py -d cifar10 -D ./data --arch resnet50 --ckpt ghn3tm8.npz \\
      --opt sgd --lr 0.1 --wd 5e-5 --scheduler cosine
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ghn3_tpu.data.images import image_loader
from ghn3_tpu.parallel.mesh import data_mesh, maybe_init_distributed
from ghn3_tpu.parallel.trainer import Trainer
from ghn3_tpu.utils.config import init_config
from ghn3_tpu.utils.logging import log


def build_model(args):
    if args.arch == 'convnet':
        from ghn3_tpu.nets.simple import ConvNet
        return ConvNet(channels=(32, 64, 128), num_classes=args.num_classes,
                       input_sz=args.imsize), None
    if str(args.arch).isdigit():
        # numeric arch = index into a DeepNets-1M split (the reference's
        # ppuda train_net surface: --arch <idx> --split val/test/...)
        from ghn3_tpu.data.deepnets1m import DeepNets1M
        from ghn3_tpu.nets.darts import Network
        if args.split == 'torch':
            raise SystemExit('--arch <index> selects a DeepNets-1M net; pass a '
                             'DeepNets split too, e.g. --split val (default '
                             "'torch' is the torchvision zoo sweep)")
        ds = DeepNets1M(split=args.split, nets_dir=args.nets_dir,
                        num_nets=int(args.arch) + 1, attach_net=False)
        g = ds[int(args.arch)]
        net = Network(num_classes=args.num_classes,
                      is_imagenet_input=args.imsize > 64, **g.net_args)
        log(f'DeepNets-1M {args.split}[{args.arch}]: {g.n_nodes} nodes, '
            f'{sum(int(np.prod(r.sz)) for c in net.param_table() for r in c.values())} params')
        return net, g
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    if args.arch in JAX_ZOO:
        return JAX_ZOO[args.arch](num_classes=args.num_classes), None
    raise NotImplementedError(args.arch)


def init_params(args, model, graph=None, beta=1e-5):
    from ghn3_tpu.evaluate import he_init_params
    params = he_init_params(model, seed=args.seed)

    if args.ckpt:  # GHN-predicted initialization
        from ghn3_tpu import GHN3
        from ghn3_tpu.graph.graphdef import GraphBatch
        from ghn3_tpu.predict import predict_batch
        from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
        from ghn3_tpu.graph.torch_trace import trace_torch_model
        ghn = GHN3.from_pretrained(args.ckpt)
        if graph is not None:
            pass                       # DeepNets split graph, already decoded
        elif args.arch == 'convnet':
            graph = model.graph_def(ve_cutoff=ghn.config.ve_cutoff)
        else:
            tm = TORCH_ZOO[args.arch](num_classes=args.num_classes)
            graph = trace_torch_model(tm, ve_cutoff=ghn.config.ve_cutoff)
        predict_batch(ghn.params, ghn.config, GraphBatch.from_graphs([graph]),
                      [model.param_table()])
        predicted = dict(model.predicted)
        # symmetry-breaking noise (reference ppuda init(beta=1e-5), trainer.py:131)
        noise_keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), len(predicted))
        for k, name in zip(noise_keys, sorted(predicted)):
            predicted[name] = predicted[name] + beta * jax.random.normal(
                k, predicted[name].shape)
        for name in params:
            if name in predicted:
                params[name] = predicted[name]
        log(f'initialized {len(predicted)} tensors from GHN checkpoint {args.ckpt}')
    return params


def main():
    maybe_init_distributed()
    args = init_config('train_net')
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    model, graph = build_model(args)
    params = init_params(args, model, graph=graph)

    data = image_loader(args.dataset, args.data_dir, imsize=args.imsize,
                        aug=args.aug, crop_pct=args.crop_pct,
                        workers=args.num_workers)
    mesh = data_mesh()
    n_batches = max(1, data.num_examples // args.batch_size)
    trainer = Trainer(model=model, model_params=params, opt=args.opt,
                      opt_args={'lr': args.lr, 'weight_decay': args.wd,
                                'momentum': args.momentum},
                      scheduler=args.scheduler, n_batches=n_batches,
                      grad_clip=args.grad_clip, label_smoothing=args.label_smoothing,
                      epochs=args.epochs, save_dir=args.save_dir, bce=args.bce,
                      mixup_fn=args.mixup, log_interval=args.log_interval,
                      mesh=mesh, seed=args.seed)

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    config = {'mode': 'train_net', 'arch': args.arch}
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
            trainer.update(images, labels)
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
