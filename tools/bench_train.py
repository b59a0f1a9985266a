"""Meta-training throughput benchmark: fresh architectures EVERY step.

Measures the property the reference workload requires (new nets per step from an
infinite sampler over 1M architectures, /root/reference/ghn3/deepnets1m.py:282-319):
steady-state step time with zero recompiles after warmup, streaming unique
meta-batches through the genotype-as-data executor.

Prints one JSON line:
  {"steps", "unique_archs", "compiled_programs", "warmup_sec",
   "steady_sec_per_step", "archs_per_sec", "device"}

Usage: python tools/bench_train.py [--steps 110] [--meta-bs 4] [--batch 32]
                                   [--hid 64] [--imsize 32] [--platform tpu|cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=110)
    ap.add_argument('--warmup', type=int, default=6)
    ap.add_argument('--meta-bs', type=int, default=4)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--hid', type=int, default=64)
    ap.add_argument('--layers', type=int, default=3)
    ap.add_argument('--imsize', type=int, default=32)
    ap.add_argument('--n-cells', type=int, default=4)
    ap.add_argument('--widths', type=int, nargs='+', default=[32])
    ap.add_argument('--num-classes', type=int, default=10)
    ap.add_argument('--heads', type=int, default=None)
    ap.add_argument('--stem-type', type=int, default=0,
                    help='1 = ImageNet stem (the paper recipe at 224px)')
    ap.add_argument('--exec', default='auto',
                    choices=['auto', 'grouped', 'scan', 'vmap'],
                    help='interpreter executor: grouped = meta-batch on the '
                         'channel axis, no lax.switch (nets/grouped.py); '
                         'scan = per-net sequential loop; auto picks grouped '
                         'when the bucket supports it')
    ap.add_argument('--vmap-nets', action='store_true',
                    help='vmap over the meta-batch instead of scanning: every '
                         'switch branch is computed + selected. Measured: OOMs '
                         'at meta-bs 8/batch 128 on one v5e (all-branch '
                         'activations); viable only at small scale / more HBM')
    ap.add_argument('--bf16', action='store_true',
                    help='bfloat16 compute for the graphormer AND target nets '
                         '(the reference --amp recipe)')
    ap.add_argument('--net-unroll', type=int, default=1,
                    help='unroll factor of the per-net scan (iterations are '
                         'independent; unrolling lets XLA interleave nets at '
                         'the cost of a larger program to compile)')
    ap.add_argument('--mfu', action='store_true',
                    help='report step FLOPs (XLA cost analysis of the compiled '
                         'step) and MFU vs the v5e bf16 peak')
    ap.add_argument('--platform', default=None)
    ap.add_argument('--profile-dir', default=None,
                    help='capture a jax.profiler trace of the steady-state '
                         'steps (view with xprof/tensorboard)')
    args = ap.parse_args()

    if args.platform:
        os.environ['JAX_PLATFORMS'] = args.platform
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()   # interpreter warmup compiles are minutes-long
    import numpy as np

    from ghn3_tpu.config import GHNConfig
    from ghn3_tpu.graph.genotypes import Genotype, random_genotype
    from ghn3_tpu.models.ghn_core import init_ghn_params
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.nets import interpreter as itp
    from ghn3_tpu.parallel.meta_executor import build_interp_batch
    from ghn3_tpu.parallel.trainer import Trainer

    ops = ('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect',
           'dil_conv_3x3', 'avg_pool_3x3', 'none')
    vocab = itp.vocab_from_genotypes([Genotype(normal=[(o, 0) for o in ops],
                                               normal_concat=[2], reduce=[],
                                               reduce_concat=[])])
    s_sp = 16 if args.imsize > 64 else 11
    cfg = GHNConfig(hid=args.hid,
                    heads=args.heads or (8 if args.hid % 8 == 0 else 4),
                    layers=args.layers, max_shape=(64, 64, s_sp, s_sp),
                    num_classes=args.num_classes,
                    dtype='bfloat16' if args.bf16 else 'float32')

    rng = np.random.default_rng(0)
    need = args.steps * args.meta_bs
    seen = set()
    graphs_by_width = {c: [] for c in args.widths}
    while sum(len(v) for v in graphs_by_width.values()) < need:
        geno = random_genotype(rng, steps=2, ops=ops)
        sig = repr(geno)
        if sig in seen:
            continue
        c = int(rng.choice(args.widths))
        net_args = dict(genotype=geno, C=c, n_cells=args.n_cells, ks=3,
                        preproc=True, C_mult=2, fc_layers=1, fc_dim=0,
                        stem_type=args.stem_type, stem_pool=False, norm='bn',
                        glob_avg=True, imagenet_stride=4)
        try:
            net = Network(num_classes=args.num_classes,
                          is_imagenet_input=args.imsize > 64, **net_args)
            g = net.graph_def()
            g.net_args = dict(net_args)
            itp.encode_arch(g, num_classes=args.num_classes,
                            is_imagenet_input=args.imsize > 64,
                            vocab=vocab, input_size=args.imsize)
        except Exception:
            continue
        seen.add(sig)
        graphs_by_width[c].append(g)

    class _Hyper:
        def __init__(self, c, p):
            self.config, self.params = c, p

    params = init_ghn_params(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(ghn=_Hyper(cfg, params), opt='adamw',
                      opt_args={'lr': 4e-4, 'weight_decay': 1e-2},
                      n_batches=args.steps, predparam_wd=3e-5,
                      label_smoothing=0.1, log_interval=10 ** 9,
                      interp_vmap=args.vmap_nets, interp_exec=args.exec,
                      interp_net_unroll=args.net_unroll)

    img_rng = np.random.default_rng(1)
    images = img_rng.normal(size=(args.batch, 3, args.imsize, args.imsize)) \
        .astype(np.float32)
    labels = img_rng.integers(0, args.num_classes, size=(args.batch,))

    # one fixed pad per width keeps the program count = #widths
    pads = {c: int(np.ceil(max(g.n_nodes for g in gs) / 16) * 16)
            for c, gs in graphs_by_width.items()}

    batches = []
    cursors = {c: 0 for c in args.widths}
    for step in range(args.steps):
        c = args.widths[step % len(args.widths)]
        gs = graphs_by_width[c]
        i = cursors[c]
        group = gs[i:i + args.meta_bs]
        if len(group) < args.meta_bs:
            break
        cursors[c] = i + args.meta_bs
        batches.append(build_interp_batch(cfg, group,
                                          num_classes=args.num_classes,
                                          is_imagenet_input=args.imsize > 64,
                                          vocab=vocab, pad_to=pads[c],
                                          input_size=args.imsize))

    t0 = time.perf_counter()
    times = []
    profiling = False
    for i, ib in enumerate(batches):
        if args.profile_dir and i == args.warmup:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        t = time.perf_counter()
        trainer.update(images, labels, meta_batch=ib)
        jax.block_until_ready(trainer._params()['embed.weight'])
        times.append(time.perf_counter() - t)
        if profiling and i == args.warmup + 2:
            jax.profiler.stop_trace()
            profiling = False
    if profiling:
        jax.profiler.stop_trace()
    total = time.perf_counter() - t0

    steady = sorted(times[args.warmup:])[len(times[args.warmup:]) // 2]
    result = {
        'steps': len(batches),
        'unique_archs': len(batches) * args.meta_bs,
        'compiled_programs': len(trainer._step_cache),
        'warmup_sec': round(sum(times[:args.warmup]), 3),
        'steady_sec_per_step': round(steady, 4),
        'archs_per_sec': round(args.meta_bs / steady, 2),
        'total_sec': round(total, 2),
        'loss': round(trainer.metrics['loss'].avg, 4),
        'device': str(jax.devices()[0]).replace('\n', ' '),
    }
    assert result['compiled_programs'] <= len(args.widths), \
        f'recompile detected: {result}'
    if args.net_unroll != 1:
        result['net_unroll'] = args.net_unroll
    if args.mfu:
        try:
            import jax.numpy as jnp
            ib = batches[-1]
            b = ib.batch
            step_fn = trainer._step_cache[ib.key]
            lowered = step_fn.lower(
                trainer._params(), trainer.opt_state, jnp.asarray(b.node_op),
                jnp.asarray(b.adj), jnp.asarray(ib.shape_ind),
                jnp.asarray(b.mask), jnp.zeros_like(jnp.asarray(b.node_op)),
                {k: jnp.asarray(v) for k, v in ib.arch.items()},
                jnp.asarray(images), jnp.asarray(labels))
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get('flops', 0.0))
            result['step_gflops'] = round(flops / 1e9, 1)
            # one v5e chip, bf16 peak; fp32 runs understate achievable MFU
            result['mfu_vs_v5e_bf16_peak'] = round(flops / steady / 197e12, 5)
        except Exception as e:   # cost analysis is best-effort
            result['mfu_error'] = repr(e)
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    main()
