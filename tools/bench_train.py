#!/usr/bin/env python
"""Meta-training step throughput on the current device (GHN-3-T-sized recipe):
meta-batch of genotype Networks on synthetic CIFAR-sized images, fp32 vs bf16
graphormer compute."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ghn3_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

import dataclasses
import jax
import numpy as np

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.graph.torch_trace import trace_torch_model
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets.torch_darts import build_torch_network
from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch

GENOS = [
    Genotype(normal=[('conv_3x3', 0), ('conv_5x5', 1)], normal_concat=[2],
             reduce=[('conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2]),
    Genotype(normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1)], normal_concat=[2],
             reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1)], reduce_concat=[2]),
    Genotype(normal=[('msa', 0), ('skip_connect', 1)], normal_concat=[2],
             reduce=[('msa', 0), ('skip_connect', 1)], reduce_concat=[2]),
    Genotype(normal=[('conv_3x3', 0), ('cse', 1)], normal_concat=[2],
             reduce=[('conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2]),
]
ARGS = dict(n_cells=4, C=32, glob_avg=True, preproc=True, C_mult=2, fc_layers=1,
            fc_dim=0, stem_type=0, stem_pool=False, norm='bn', ks=3)


def run(dtype: str, batch_size: int = 64, steps: int = 10):
    cfg = GHNConfig(hid=64, heads=8, layers=3, max_shape=(64, 64, 11, 11),
                    num_classes=10, layernorm=True, dtype=dtype)
    ghn = GHN3(cfg, seed=0)
    nets, graphs = [], []
    for geno in GENOS:
        twin = build_torch_network(geno, num_classes=10, is_imagenet_input=False, **ARGS)
        graphs.append(trace_torch_model(twin, ve_cutoff=cfg.ve_cutoff))
        nets.append(Network(genotype=geno, num_classes=10, is_imagenet_input=False,
                            imagenet_stride=4, auxiliary=False, **ARGS))
    mb = build_meta_batch(cfg, GraphBatch.from_graphs(graphs), nets)
    print(f'[{dtype}] meta-batch: {len(nets)} nets, N_pad={mb.batch.n_pad}, '
          f'{sum(len(v) for v in mb.plan.groups.values())} tensors')

    rng = np.random.default_rng(0)
    images = rng.normal(size=(batch_size, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(batch_size,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 4e-4, 'weight_decay': 1e-2},
                      scheduler='cosine-warmup', n_batches=steps, epochs=1,
                      predparam_wd=3e-5, grad_clip=5.0)
    t0 = time.time()
    trainer.update(images, labels, meta_batch=mb)
    print(f'[{dtype}] compile+first step: {time.time() - t0:.1f}s')
    t0 = time.time()
    for _ in range(steps):
        m = trainer.update(images, labels, meta_batch=mb)
    dt = (time.time() - t0) / steps
    print(f'[{dtype}] steady-state: {dt * 1e3:.0f} ms/step '
          f'({batch_size / dt:.0f} img/s x {len(nets)} nets), loss={m["loss"].avg:.3f}')


if __name__ == '__main__':
    print('device:', jax.devices()[0])
    run('float32')
    run('bfloat16')
