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

    if args.arch == 'convnet':
        from ghn3_tpu.nets.simple import ConvNet
        model = ConvNet(channels=(32, 64, 128), num_classes=args.num_classes,
                        input_sz=args.imsize)
    else:
        from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
        model = JAX_ZOO[args.arch](num_classes=args.num_classes)

    data_file = np.load(args.ckpt, allow_pickle=True)
    params = {k: jnp.asarray(data_file[k]) for k in data_file.files
              if not k.startswith('__')}
    data = image_loader(args.dataset, args.data_dir, imsize=args.imsize, split='val',
                        crop_pct=args.crop_pct)
    top1, top5 = infer(model, params, data, batch_size=args.val_batch_size)
    log(f'{args.arch}: top1={top1:.3f} top5={top5:.3f}')


if __name__ == '__main__':
    main()
