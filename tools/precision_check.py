#!/usr/bin/env python
"""Measure the accuracy cost of matmul_precision='high' (3-pass bf16) vs the
parity default 'highest' (6-pass) on the fp32 predict path, on real TPU.

CPU matmuls are true fp32 at every precision setting, so this difference only
exists on the MXU — run on the chip. Reports, per architecture, the max
relative element error and the paramnorm delta of the packed prediction
buffer; the norm-check tolerance that gates the reference's eval sweep is
1e-2 (reference nn.py:783-797), so anything at ~1e-6..1e-4 is far inside it.

  python tools/precision_check.py --archs resnet50,vgg11,mini_vit
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--archs', default='resnet18,mobilenet_v2,densenet121')
    ap.add_argument('--hid', type=int, default=384)
    ap.add_argument('--platform', default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax

    from ghn3_tpu import GHN3, GHNConfig
    from ghn3_tpu.graph.cache import cached_graph
    from ghn3_tpu.graph.graphdef import GraphBatch
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.predict import predict_packed
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO

    base = GHNConfig.ghn3_xl() if args.hid == 384 else GHNConfig.ghn3_t()
    with jax.default_device(jax.devices('cpu')[0]):
        ghn = GHN3(base, seed=0)
    dev = jax.devices()[0]
    ghn.params = {k: jax.device_put(v, dev) for k, v in ghn.params.items()}

    rows = []
    for name in args.archs.split(','):
        graph = cached_graph(name, lambda: trace_torch_model(
            TORCH_ZOO[name](), ve_cutoff=base.ve_cutoff), ve_cutoff=base.ve_cutoff)
        table = JAX_ZOO[name]().param_table()
        batch = GraphBatch.from_graphs([graph])
        out = {}
        for prec in ('highest', 'high'):
            cfg = dataclasses.replace(base, matmul_precision=prec)
            views = predict_packed(ghn.params, cfg, batch, [table])
            out[prec] = np.asarray(jax.device_get(views[0].buffer))
        a, b = out['highest'], out['high']
        denom = np.maximum(np.abs(a), 1e-6)
        rows.append({
            'arch': name,
            'n_params': int(a.size),
            'max_rel_err': float(np.max(np.abs(a - b) / denom)),
            'mean_rel_err': float(np.mean(np.abs(a - b) / denom)),
            'paramnorm_highest': float(np.linalg.norm(a)),
            'paramnorm_high': float(np.linalg.norm(b)),
            'paramnorm_rel_delta': float(abs(np.linalg.norm(a) - np.linalg.norm(b))
                                         / max(np.linalg.norm(a), 1e-9)),
        })
        print(json.dumps(rows[-1]))
    worst = max(r['paramnorm_rel_delta'] for r in rows)
    print(json.dumps({'worst_paramnorm_rel_delta': worst,
                      'norm_check_tol': 1e-2, 'inside_tol': worst < 1e-2}))


if __name__ == '__main__':
    main()
