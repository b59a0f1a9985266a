#!/usr/bin/env python
"""Single-model workflow (reference examples/ghn_single_model.py):

1. predict parameters for one network with a GHN,
2. fine-tune the network from the predicted initialization,
3. fine-tune the GHN itself on that single network (graph reuse across steps).

Runs end-to-end on synthetic data; pass --ckpt to start from a trained GHN.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch
from ghn3_tpu.predict import predict_batch
from ghn3_tpu.utils.logging import log


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', type=str, default=None)
    p.add_argument('--platform', type=str, default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    ghn = GHN3.from_pretrained(args.ckpt) if args.ckpt else \
        GHN3(GHNConfig(hid=32, heads=4, layers=2, max_shape=(32, 32, 11, 11),
                       num_classes=10), seed=0)

    # 1) predict parameters for one model
    net = ConvNet(channels=(16, 32), num_classes=10)
    graph = net.graph_def(ve_cutoff=ghn.config.ve_cutoff)
    predict_batch(ghn.params, ghn.config, GraphBatch.from_graphs([graph]),
                  [net.param_table()], to_host=False)
    log(f'predicted {len(net.predicted)} parameter tensors')

    rng = np.random.default_rng(0)
    images = rng.normal(size=(32, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(32,))

    # 2) fine-tune the network from the predicted init
    params = {k: net.predicted[k] for k in net.predicted.keys()}
    net_trainer = Trainer(model=net, model_params=params, opt='sgd',
                          opt_args={'lr': 0.01, 'momentum': 0.9}, scheduler='cosine',
                          n_batches=5, epochs=1)
    for step in range(5):
        m = net_trainer.update(images, labels)
    log(f'fine-tuned net: loss {m["loss"].avg:.4f} top1 {m["top1"].avg:.1f}')

    # 3) fine-tune the GHN on this single network (graph built once, reused)
    mb = build_meta_batch(ghn.config, GraphBatch.from_graphs([graph]), [net])
    ghn_trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3, 'weight_decay': 1e-2},
                          scheduler='cosine', n_batches=5, epochs=1, predparam_wd=3e-5)
    for step in range(5):
        m = ghn_trainer.update(images, labels, meta_batch=mb)
    log(f'fine-tuned GHN: loss {m["loss"].avg:.4f} top1 {m["top1"].avg:.1f}')


if __name__ == '__main__':
    main()
