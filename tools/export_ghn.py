#!/usr/bin/env python
"""Export a compiled parameter-prediction program as a serving artifact.

For a FIXED target architecture, the whole GHN pipeline (embed -> graphormer
-> decode -> tile/normalize -> packed assembly) is one pure function
``ghn_params -> packed parameter buffer``. This tool traces that function,
serializes it with ``jax.export`` (StableHLO), and writes:

    <out>/ghn_predict_<arch>.bin    the serialized program
    <out>/ghn_predict_<arch>.json   buffer spec: name -> (offset, shape), plus
                                    the GHN config and export platforms

A serving process can then predict all parameters of the architecture with no
model-building Python (graph tracing, plan matching, zoo code) on the hot
path — deserialize once, call with the GHN weights (hot-swappable), slice the
buffer by the spec:

    from jax import export
    exp = export.deserialize(open('ghn_predict_resnet18.bin', 'rb').read())
    buffer = exp.call(ghn_params)           # all parameters in one forward

The artifact is platform-targeted (the ``platforms`` field records it): export
on the deploy platform, e.g. run this tool on the TPU host for TPU serving.
The reference has no serving path; its closest surface is eval_ghn --save_ckpt
(one-off weight export), which cli/eval_ghn.py also provides.

Example:
    python tools/export_ghn.py --arch resnet18 --ckpt ghn3tm8.npz --out ./export
    python tools/export_ghn.py --arch convnet --platform cpu --out /tmp/export
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_target(arch: str, num_classes: int, ve_cutoff: int):
    """(graph, param_table) for a zoo architecture or the smoke convnet."""
    if arch == 'convnet':
        from ghn3_tpu.nets.simple import ConvNet
        net = ConvNet(channels=(16, 32), num_classes=num_classes)
        return net.graph_def(ve_cutoff=ve_cutoff), net.param_table()
    from ghn3_tpu.graph.cache import cached_graph
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
    graph = cached_graph(arch, lambda: trace_torch_model(
        TORCH_ZOO[arch](), ve_cutoff=ve_cutoff), ve_cutoff=ve_cutoff)
    table = JAX_ZOO[arch]().param_table()
    return graph, table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='resnet18')
    ap.add_argument('--ckpt', default=None,
                    help='GHN checkpoint (.npz/.pt); fresh random GHN if unset')
    ap.add_argument('--hid', type=int, default=64)
    ap.add_argument('--layers', type=int, default=3)
    ap.add_argument('--heads', type=int, default=8)
    ap.add_argument('--num_classes', type=int, default=10)
    ap.add_argument('--max_shape', type=int, nargs=4, default=(64, 64, 11, 11))
    ap.add_argument('--out', default='./export')
    ap.add_argument('--platform', default=None,
                    help='force a JAX platform (cpu for offline smoke)')
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    import jax.numpy as jnp

    from ghn3_tpu import GHN3, GHNConfig
    from ghn3_tpu import predict as P
    from ghn3_tpu.graph.graphdef import GraphBatch
    from ghn3_tpu.utils.logging import log

    if args.ckpt:
        ghn = GHN3.from_pretrained(args.ckpt)
        cfg = ghn.config
    else:
        cfg = GHNConfig(hid=args.hid, heads=args.heads, layers=args.layers,
                        max_shape=tuple(args.max_shape),
                        num_classes=args.num_classes, layernorm=True)
        ghn = GHN3(cfg, seed=0)

    graph, table = build_target(args.arch, cfg.num_classes, cfg.ve_cutoff)
    batch = GraphBatch.from_graphs([graph])
    plan = P.build_plan(batch, [table], cfg)
    active = list(plan.groups.items())

    node_op = jnp.asarray(batch.node_op)
    adj = jnp.asarray(batch.adj)
    mask = jnp.asarray(batch.mask)
    shape_ind = jnp.asarray(plan.shape_ind)
    levels = jnp.asarray(P.batch_levels(batch) if cfg.is_ghn2
                         else np.zeros_like(batch.node_op))
    fwd = P._forward_fn(cfg)

    def predict_fn(params):
        x_flat = fwd(params, node_op, adj, shape_ind, mask, levels)
        packed, _sig = P._run_packed(params, cfg, x_flat, active,
                                     cfg.weight_norm)
        return packed

    # trace + export against the checkpoint's parameter shapes
    arg_spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                for k, v in ghn.params.items()}
    from jax import export as jexport
    exported = jexport.export(jax.jit(predict_fn))(arg_spec)
    data = exported.serialize()

    # buffer spec for consumers: name -> (offset, shape)
    views = P.predict_packed(ghn.params, cfg, batch, [table])
    spec = {name: [int(off), list(sz)]
            for name, (off, sz) in views[0].spec.items()}

    # roundtrip verification before writing anything
    back = jexport.deserialize(data)
    buf = back.call(ghn.params)
    np.testing.assert_allclose(np.asarray(buf), np.asarray(views[0].buffer),
                               atol=1e-6, rtol=1e-6)

    os.makedirs(args.out, exist_ok=True)
    bin_path = os.path.join(args.out, f'ghn_predict_{args.arch}.bin')
    with open(bin_path, 'wb') as f:
        f.write(data)
    meta = {'arch': args.arch, 'platforms': list(exported.platforms),
            'buffer_elems': int(np.asarray(buf).size),
            'ghn_config': {k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in vars(cfg).items()
                           if isinstance(v, (int, float, str, bool, tuple))},
            'spec': spec}
    with open(bin_path.replace('.bin', '.json'), 'w') as f:
        json.dump(meta, f, indent=1)
    log(f'exported {args.arch}: {len(data) / 1e6:.2f} MB program, '
        f'{len(spec)} tensors, {meta["buffer_elems"]} packed elems, '
        f'platforms={exported.platforms} -> {bin_path} (roundtrip verified)')


if __name__ == '__main__':
    main()
