#!/usr/bin/env python
"""Evaluate a trained target-network checkpoint: top-1/top-5 on the val split
(reference eval.py, SURVEY §2 row 19).

Example:
  python cli/eval_net.py --arch resnet50 --ckpt checkpoints/exp/checkpoint.npz \\
      -d imagenet -D /data/imagenet
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from ghn3_tpu.data.images import image_loader
from ghn3_tpu.evaluate import infer
from ghn3_tpu.utils.config import init_config
from ghn3_tpu.utils.logging import log


def main():
    args = init_config('eval')
    assert args.ckpt, '--ckpt is required'
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    if args.arch == 'convnet':
        from ghn3_tpu.nets.simple import ConvNet
        model = ConvNet(channels=(32, 64, 128), num_classes=args.num_classes,
                        input_sz=args.imsize)
    elif str(args.arch).isdigit():
        # numeric arch = index into a DeepNets-1M split (reference eval.py ->
        # ppuda init_config --arch semantics, mirrored from cli/train_net.py)
        from ghn3_tpu.data.deepnets1m import DeepNets1M
        from ghn3_tpu.nets.darts import Network
        if args.split == 'torch':
            raise SystemExit('--arch <index> selects a DeepNets-1M net; pass a '
                             'DeepNets split too, e.g. --split val (default '
                             "'torch' is the torchvision zoo sweep)")
        ds = DeepNets1M(split=args.split, nets_dir=args.nets_dir,
                        num_nets=int(args.arch) + 1, attach_net=False)
        g = ds[int(args.arch)]
        model = Network(num_classes=args.num_classes,
                        is_imagenet_input=(args.imsize or 32) > 64, **g.net_args)
    else:
        from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
        model = JAX_ZOO[args.arch](num_classes=args.num_classes)

    data_file = np.load(args.ckpt, allow_pickle=True)
    params = {k: jnp.asarray(data_file[k]) for k in data_file.files
              if not k.startswith('__')}
    # inception_v3 evaluates at 299 px unless the user pinned -i
    # (reference eval.py im_size choice)
    imsize = (299 if args.arch == 'inception_v3' and not args.imsize_explicit
              else args.imsize)
    data = image_loader(args.dataset, args.data_dir, imsize=imsize, split='val',
                        noise=args.noise, crop_pct=args.crop_pct)
    top1, top5 = infer(model, params, data, batch_size=args.val_batch_size)
    log(f'{args.arch}: top1={top1:.3f} top5={top5:.3f}')


if __name__ == '__main__':
    main()
