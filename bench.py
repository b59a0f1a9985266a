#!/usr/bin/env python
"""Headline benchmark: parameter-prediction throughput of a GHN-3-XL-sized
hypernetwork over the full zoo suite, plus MFU and meta-training steady state.

Mirrors the reference eval sweep (eval_ghn.py --split torch) which predicts
parameters per torchvision model on a GPU; here graphs are compiled host-side
once per architecture and predictions run batched on TPU in node-count buckets.

Scope honesty: throughput/MFU are measured with randomly initialized GHN weights
(published checkpoints are not fetchable in this zero-egress environment), so
accuracy parity is NOT covered here — the golden tests in tests/ cover numerics
against the reference implementation instead. vs_baseline normalizes against
10 models/sec (BASELINE.md north star: >= 10x an assumed ~1 model/sec A100).

MFU: total XLA-reported FLOPs of the executed programs (graphormer forward +
fused decode/assemble) / wall time / peak. Peak assumed 197e12 FLOP/s for a
TPU v5e chip (bf16); the fp32-precision run understates achievable MFU.

Robustness contract (the round-3 driver capture was lost to a timeout kill —
rc=124, nothing printed): the ONE JSON line is guaranteed to be printed with
whatever has completed, via
  * a provisional headline recorded as soon as the first timed sweep rep lands,
  * SIGTERM/SIGINT handlers + an atexit hook that emit the current result,
  * a wall-clock deadline (GHN3_BENCH_DEADLINE seconds, default 1200) after
    which remaining detail blocks are skipped and marked {"skipped": "deadline"},
  * each device detail block runs on a watchdog'd worker thread — if it blows
    its time slice (e.g. a cold multi-minute XLA compile), the block is marked
    and the process emits + exits rather than hanging until the driver kills it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""
import atexit
import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

V5E_PEAK_FLOPS = 197e12   # bf16 peak of one v5e (v5 lite) chip

T_START = time.time()
# Driver captures are SIGTERM'd at ~1800 s (BENCH_r03/r04 rc=124); 1500 leaves
# a 5-minute margin for the detail blocks' own watchdogs + emission.
DEADLINE_SEC = float(os.environ.get('GHN3_BENCH_DEADLINE', 1500))

# ---------------------------------------------------------------------------
# Emit-once result state. RESULT is updated in place as stages complete so a
# kill at ANY point still reports everything finished so far.
# ---------------------------------------------------------------------------
RESULT = {
    'metric': 'models/sec param-prediction on TPU (ghn3xl-sized zoo suite, '
              'device-resident params)',
    'value': 0.0,
    'unit': 'models/sec',
    'vs_baseline': 0.0,
    'detail': {'incomplete': 'killed before the first timed sweep rep'},
}
_EMITTED = False
_EMIT_LOCK = threading.Lock()
# Deferred MFU closure: predict_suite stores it, main() runs it after the
# meta_train / imagenet_scale blocks (lowest budget priority).
MFU_FN = [None]


def _emit():
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        RESULT['detail']['bench_wall_sec'] = round(time.time() - T_START, 1)
        sys.stdout.flush()
        print(json.dumps(RESULT))
        sys.stdout.flush()


def _on_signal(signum, frame):
    RESULT['detail'].setdefault('terminated_by', signal.Signals(signum).name)
    _emit()
    os._exit(0)


# Install the kill handlers IMMEDIATELY (not in main()): the interpreter's own
# startup (sitecustomize TPU-plugin registration) already eats ~7 s that no
# Python code can cover, so every line after this one must be — a driver
# SIGTERM during main()'s `import jax` used to die with rc=143 and no output.
if __name__ == '__main__':
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    atexit.register(_emit)


def _remaining() -> float:
    return DEADLINE_SEC - (time.time() - T_START)


def _set_headline(models_per_sec: float, provisional: bool):
    RESULT['value'] = round(models_per_sec, 3)
    RESULT['vs_baseline'] = round(models_per_sec / 10.0, 3)
    d = RESULT['detail']
    d.pop('incomplete', None)
    if provisional:
        d['headline_provisional'] = 'best-of-reps so far; more reps pending'
    else:
        d.pop('headline_provisional', None)


def _flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get('flops', 0.0))
    except Exception:
        return 0.0


def _warm_one(args):
    """Worker: trace one zoo model into the shared graph disk cache.
    Runs in a spawned process; forces CPU so it never touches the TPU the
    parent holds."""
    name, ve_cutoff = args
    import os as _os
    _os.environ['JAX_PLATFORMS'] = 'cpu'
    import sys as _sys
    repo = _os.path.dirname(_os.path.abspath(__file__))
    if repo not in _sys.path:
        _sys.path.insert(0, repo)
    from ghn3_tpu.graph.cache import cached_graph
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
    cached_graph(name, lambda: trace_torch_model(TORCH_ZOO[name](),
                                                 ve_cutoff=ve_cutoff),
                 ve_cutoff=ve_cutoff)
    return name


def warm_graph_cache(names, ve_cutoff):
    """Parallel host graph compilation: tracing is single-threaded python/torch
    per model (~1-20 s each), so fan the first-run sweep out over processes.
    Subsequent runs hit the disk cache and skip this entirely."""
    from ghn3_tpu.graph.cache import cache_path
    pending = [n for n in names
               if not os.path.exists(cache_path(n, ve_cutoff))]
    if len(pending) <= 2:
        return
    try:
        import multiprocessing as mp
        ctx = mp.get_context('spawn')
        workers = min(len(pending), max(2, (os.cpu_count() or 8) - 2))
        with ctx.Pool(workers) as pool:
            pool.map(_warm_one, [(n, ve_cutoff) for n in pending])
    except Exception:
        pass  # sequential path below still builds everything


def predict_suite(jax):
    from ghn3_tpu import GHN3, GHNConfig
    from ghn3_tpu import predict as P
    from ghn3_tpu.graph.cache import cached_graph
    from ghn3_tpu.graph.graphdef import GraphBatch
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.torch_interop import torch_param_table
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO

    suite = sorted(TORCH_ZOO)
    sub = os.environ.get('GHN3_BENCH_SUITE', '')
    if sub:   # debug/smoke: comma-separated names or a count prefix
        suite = (sub.split(',') if ',' in sub or not sub.isdigit()
                 else sorted(suite, key=lambda n: n)[:int(sub)])
    cfg = (GHNConfig(hid=32, heads=2, layers=2, max_shape=(64, 64, 11, 11))
           if os.environ.get('GHN3_BENCH_CFG') == 'small' else GHNConfig.ghn3_xl())
    if os.environ.get('GHN3_BENCH_DTYPE'):   # e.g. bfloat16 speed-mode sweep
        import dataclasses
        cfg = dataclasses.replace(cfg, dtype=os.environ['GHN3_BENCH_DTYPE'])
    if os.environ.get('GHN3_BENCH_PRECISION'):  # e.g. 'high' (3-pass bf16 fp32)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, matmul_precision=os.environ['GHN3_BENCH_PRECISION'])
    RESULT['metric'] = ('models/sec param-prediction on TPU (ghn3xl-sized, '
                        '%d-arch zoo suite, device-resident params)' % len(suite))
    # init on CPU (avoids a dozen TPU init-program compiles), then one transfer
    with jax.default_device(jax.devices('cpu')[0]):
        ghn = GHN3(cfg, seed=0)
    device = jax.devices()[0]
    ghn.params = {k: jax.device_put(v, device) for k, v in ghn.params.items()}

    t0 = time.time()
    warm_graph_cache(suite, cfg.ve_cutoff)
    # torch models are constructed lazily (graph-cache misses only) so the
    # sweep never holds 79 full-size torch nets (~13 GB of weights) in RAM;
    # shape tables come from the JAX twins, which declare shapes without arrays
    graphs = {n: cached_graph(n, lambda n=n: trace_torch_model(
        TORCH_ZOO[n](), ve_cutoff=cfg.ve_cutoff), ve_cutoff=cfg.ve_cutoff)
        for n in suite}
    tables = {n: (JAX_ZOO[n]().param_table() if n in JAX_ZOO
                  else torch_param_table(TORCH_ZOO[n]())) for n in suite}
    t_graphs = time.time() - t0

    # chunk the suite so each packed-output program fits HBM; shares the
    # GHN3_CHUNK_BUDGET knob (default 150M params/chunk) with the eval sweep
    # (evaluate.chunk_by_params) so both compile the SAME programs
    from ghn3_tpu.evaluate import chunk_by_params
    param_count = {n: sum(int(np.prod(r.sz)) for cell in tables[n]
                          for r in cell.values()) for n in suite}
    chunks = chunk_by_params(graphs, tables)
    batches = [(chunk, GraphBatch.from_graphs([graphs[n] for n in chunk]))
               for chunk in chunks]

    # GHN3_BENCH_WINDOW: number of chunks allowed in flight before blocking.
    # 1 = fully synchronous (one tunnel sync round-trip per chunk — 31 syncs
    # per sweep). Larger windows pipeline the per-chunk dispatch+sync latency
    # against device execution at the cost of window-many live packed buffers
    # (~0.6 GB each at the 150M-param chunk budget). MEASURED (round 4, quiet
    # chip, best-of-8): window 1 -> 401 models/s, 4 -> 383, 31 (unbounded) ->
    # 400 — within run-to-run noise, so the sweep is compute-bound, not
    # dispatch-latency-bound; default stays 1 (lowest HBM footprint). An
    # earlier double-buffering variant also measured worse (313 vs 380).
    window = int(os.environ.get('GHN3_BENCH_WINDOW', 1))

    def run_sweep():
        inflight = []
        for chunk, batch in batches:
            views = P.predict_packed(ghn.params, cfg, batch,
                                     [tables[n] for n in chunk])
            inflight.append(views[0].buffer)
            if len(inflight) >= window:
                jax.block_until_ready(inflight.pop(0))
        for buf in inflight:
            jax.block_until_ready(buf)

    RESULT['detail'].update({
        'suite': len(suite),
        'chunks': len(batches),
        'total_params_predicted': int(sum(param_count.values())),
        'graph_build_total_sec': round(t_graphs, 2),
    })
    detail = RESULT['detail']   # mutated in place so every kill sees progress

    # ---- deadline-gated warmup: warm + time CHUNK BY CHUNK -----------------
    # A cold sweep costs minutes-per-chunk of XLA compile (BENCH_r04: 1,375 s
    # for 31 chunks); warming the whole sweep before taking any timing lost
    # rounds 3+4 to the driver kill. Instead each chunk is compiled then
    # immediately re-timed, and a provisional headline from COMPLETED chunks'
    # best times is published as we go — a kill mid-warmup still reports real
    # throughput over the models actually swept. With window=1 a full-sweep
    # rep equals the sum of per-chunk times (measured equal, round 4), so the
    # per-chunk-sum is an unbiased stand-in until full-sweep reps land.
    # GHN3_BENCH_COMPILE_AHEAD: warm chunk compiles on a thread pool so the
    # XLA/tunnel compiler works on several programs concurrently (each chunk
    # is a distinct program pair; compiles are independent). The main loop
    # still consumes chunks IN ORDER, so per-chunk timing and the provisional
    # headline semantics are unchanged; in-flight compiles of later chunks can
    # only inflate (never deflate) the truncated-case per-chunk times.
    compile_ahead = int(os.environ.get('GHN3_BENCH_COMPILE_AHEAD', 4))

    def warm_chunk(ci):
        chunk, batch = batches[ci]
        t1 = time.time()
        views = P.predict_packed(ghn.params, cfg, batch,
                                 [tables[n] for n in chunk])
        jax.block_until_ready(views[0].buffer)
        return time.time() - t1

    executor = None
    futures = {}
    if compile_ahead > 1 and len(batches) > 1:
        import concurrent.futures
        executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=compile_ahead)
        futures = {ci: executor.submit(warm_chunk, ci)
                   for ci in range(len(batches))}

    t0 = time.time()
    chunk_best = []
    models_done = 0
    warm_all = True
    for ci, (chunk, batch) in enumerate(batches):
        t1 = time.time()
        if futures:
            try:
                # chunk 0 waits unbounded — SOME throughput number must always
                # land (the watchdog/SIGTERM handlers cover a hung compile)
                futures[ci].result(timeout=None if ci == 0 else
                                   max(30.0, _remaining() - 30.0))
            except Exception as e:
                if 'Timeout' in type(e).__name__:
                    warm_all = False
                    detail['warmup_truncated'] = (
                        f'deadline: {ci}/{len(batches)} chunks warmed in '
                        f'{round(time.time() - t0, 2)} s (compile in flight)')
                    break
                raise
        else:
            views = P.predict_packed(ghn.params, cfg, batch,
                                     [tables[n] for n in chunk])
            jax.block_until_ready(views[0].buffer)
        t_compile = time.time() - t1
        best = None
        for _ in range(2):   # quick re-times now that this chunk is compiled
            t1 = time.time()
            views = P.predict_packed(ghn.params, cfg, batch,
                                     [tables[n] for n in chunk])
            jax.block_until_ready(views[0].buffer)
            dt = time.time() - t1
            best = dt if best is None else min(best, dt)
        chunk_best.append(best)
        models_done += len(chunk)
        detail['warmup_chunks_done'] = ci + 1
        detail['warmup_incl_compile_sec'] = round(time.time() - t0, 2)
        if models_done and sum(chunk_best) > 0:
            rate = models_done / sum(chunk_best)
            detail['models_per_sec'] = rate
            detail['models_warmed'] = models_done
            _set_headline(rate, provisional=True)
            RESULT['detail']['headline_source'] = (
                'sum of per-chunk best times over warmed chunks')
        # budget check: leave room for at least one more chunk compile of the
        # size just observed, plus emission margin
        if ci + 1 < len(batches) and _remaining() < max(60.0, 1.5 * t_compile):
            warm_all = False
            detail['warmup_truncated'] = (
                f'deadline: {ci + 1}/{len(batches)} chunks warmed in '
                f'{detail["warmup_incl_compile_sec"]} s')
            break
    if executor is not None:
        executor.shutdown(wait=False, cancel_futures=True)
    if not warm_all:
        return

    # Headline is the BEST-OF-N rep. The sweep is a fixed set of deterministic
    # compiled programs; the tunnel chip is multi-tenant, so per-rep wall time
    # = true program time + non-negative co-tenant/tunnel interference. The
    # minimum over reps is the least-biased estimator of the true time (the
    # round-3→4 runs show the median swinging 0.21→0.39 s on identical
    # programs purely from co-tenant load). Mean/median/all reps are reported
    # alongside so the distribution is visible. The FIRST rep lands a
    # provisional headline immediately so a kill during the remaining reps
    # still reports a real throughput number.
    n_rep = int(os.environ.get('GHN3_BENCH_REPS', 8))
    # GHN3_BENCH_REP_SLEEP: idle seconds between reps (diagnostic). Round-4
    # runs consistently show ~5 fast reps (~0.2 s) then a 3-4x slowdown on
    # identical programs — the signature of a burst-then-throttle rate limit
    # (or thermal cap) on the shared tunnel chip rather than random co-tenant
    # noise; idling between reps tests whether the budget refills.
    rep_sleep = float(os.environ.get('GHN3_BENCH_REP_SLEEP', 0))
    rep_times = []
    for i in range(n_rep):
        if rep_sleep and i:
            time.sleep(rep_sleep)
        t0 = time.time()
        run_sweep()
        rep_times.append(time.time() - t0)
        t_predict = float(np.min(rep_times))
        RESULT['detail']['models_per_sec'] = len(suite) / t_predict
        RESULT['detail']['predict_sweep_sec'] = round(t_predict, 3)
        RESULT['detail']['sweep_reps_done'] = i + 1
        RESULT['detail']['headline_source'] = 'best of full-sweep reps'
        _set_headline(len(suite) / t_predict, provisional=i + 1 < n_rep)
        if i + 1 < n_rep and _remaining() < 30:
            break   # deadline pressure: keep what we have, skip extra reps
    t_predict = float(np.min(rep_times))
    RESULT['detail']['sweep_sec_mean'] = round(float(np.mean(rep_times)), 3)
    RESULT['detail']['sweep_sec_median'] = round(float(np.median(rep_times)), 3)
    RESULT['detail']['sweep_sec_reps'] = [round(t, 3) for t in rep_times]

    # MFU accounting needs a host-side lowering pass over every chunk program
    # (minutes, even warm).  meta_train / imagenet_scale have priority for the
    # remaining deadline budget (4 rounds of driver captures never reached
    # them), so defer the MFU pass: main() runs it LAST via this closure.
    def compute_mfu():
        total_flops = 0.0
        for chunk, batch in batches:
            plan = P.build_plan(batch, [tables[n] for n in chunk], cfg)
            levels = np.zeros_like(batch.node_op)
            total_flops += _flops(P._forward_fn(cfg).lower(
                ghn.params, batch.node_op, batch.adj, plan.shape_ind, batch.mask,
                levels).compile())
            active = list(plan.groups.items())
            signature = tuple(
                (key, tuple((tuple(it.target_sz), bool(it.record.is_w)) for it in items))
                for key, items in active)
            inds_groups = []
            for key, items in active:
                g = len(items)
                inds = np.zeros((P._group_bucket(g),), dtype=np.int32)
                inds[:g] = [it.flat_idx for it in items]
                inds_groups.append(inds)
            x_flat_shape = jax.ShapeDtypeStruct((len(batch) * batch.n_pad, cfg.hid),
                                                np.float32)
            total_flops += _flops(P._assemble_all_fn(cfg, signature, cfg.weight_norm)
                                  .lower(ghn.params, x_flat_shape,
                                         tuple(inds_groups)).compile())
        if total_flops:
            RESULT['detail']['sweep_gflops'] = round(total_flops / 1e9, 1)
            RESULT['detail']['mfu_vs_v5e_bf16_peak'] = round(
                total_flops / t_predict / V5E_PEAK_FLOPS, 6)

    MFU_FN[0] = compute_mfu


def meta_train_detail():
    """Steady-state meta-training with fresh architectures every step."""
    import tools.bench_train as bt
    argv = sys.argv
    sys.argv = ['bench_train.py', '--steps', '36', '--warmup', '6',
                '--meta-bs', '8', '--batch', '128', '--hid', '64',
                '--layers', '3', '--n-cells', '4', '--widths', '32', '--bf16']
    try:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            res = bt.main()
        return res
    finally:
        sys.argv = argv


def imagenet_scale_detail():
    """Meta-training at the PAPER recipe scale (reference train_ghn_ddp.py:16-22):
    ImageNet geometry (224 px, 1000 classes, ImageNet stems) with an XL-class
    GHN (hid 256, 16 heads), meta-batch 8 x image batch 128 (synthetic images —
    the measurement is step time / fit, not accuracy)."""
    import tools.bench_train as bt
    argv = sys.argv
    sys.argv = ['bench_train.py', '--steps', '10', '--warmup', '3',
                '--meta-bs', '8', '--batch', '128', '--hid', '256',
                '--layers', '3', '--heads', '16', '--imsize', '224',
                '--num-classes', '1000', '--stem-type', '1', '--n-cells', '4',
                '--widths', '32', '--bf16']
    try:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            res = bt.main()
        return res
    finally:
        sys.argv = argv


def learning_proof_detail():
    """Meta-learning evidence measured during the round (tools/learning_proof.py):
    a GHN meta-trained on digits over a generated DeepNets-1M split, evaluated
    on HELD-OUT architectures vs random init (RESULTS.md), plus the published
    out-of-distribution splits (wide/deep/dense/bnfree), the fine-tuning
    story (GHN init vs He init under an identical SGD budget), the trained
    GHN-2 baseline contrast, and the prediction-based NAS demo."""
    rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results')
    path = os.path.join(rdir, 'learning_proof.json')
    if not os.path.exists(path):
        return None
    with open(path) as f:
        s = json.load(f)
    out = {k: s[k] for k in ('dataset', 'split', 'n_archs',
                             'mean_top1_predicted', 'mean_top1_untrained_ghn',
                             'mean_top1_randinit', 'archs_beating_randinit')
           if k in s}
    ood = {}
    for split in ('test', 'wide', 'deep', 'dense', 'bnfree'):
        p = os.path.join(rdir, f'ood_{split}.json')
        if os.path.exists(p):
            with open(p) as f:
                o = json.load(f)
            ood[split] = {'predicted': round(o['mean_top1_predicted'], 2),
                          'randinit': round(o['mean_top1_randinit'], 2),
                          'beat_randinit': f"{o['archs_beating_randinit']}"
                                           f"/{o['n_archs']}"}
    if ood:
        out['ood_splits'] = ood
    p = os.path.join(rdir, 'finetune_proof.json')
    if os.path.exists(p):
        with open(p) as f:
            ft = json.load(f)
        out['finetune'] = ft['mean_top1']
    p = os.path.join(rdir, 'ghn2_proof.json')
    if os.path.exists(p):  # trained GHN-2 baseline (GatedGNN path) contrast
        with open(p) as f:
            o = json.load(f)
        out['ghn2_baseline'] = {
            'predicted': round(o['mean_top1_predicted'], 2),
            'randinit': round(o['mean_top1_randinit'], 2),
            'beat_randinit': f"{o['archs_beating_randinit']}/{o['n_archs']}"}
    p = os.path.join(rdir, 'learning_proof_ops.json')
    if os.path.exists(p):  # second proof over the full op pool (msa/cse)
        with open(p) as f:
            o = json.load(f)
        out['ops_diverse'] = {
            'predicted': round(o['mean_top1_predicted'], 2),
            'randinit': round(o['mean_top1_randinit'], 2),
            'beat_randinit': f"{o['archs_beating_randinit']}/{o['n_archs']}"}
    p = os.path.join(rdir, 'bnfree_control.json')
    if os.path.exists(p):  # positive control: bnfree split, GHN meta-trained
        with open(p) as f:  # on a 30%-norm-free distribution (off-protocol,
            o = json.load(f)  # labeled as such — see RESULTS.md)
        out['bnfree_control'] = {
            'predicted': round(o['mean_top1_predicted'], 2),
            'randinit': round(o['mean_top1_randinit'], 2),
            'beat_randinit': f"{o['archs_beating_randinit']}/{o['n_archs']}"}
    lscale = {}
    for split in ('val', 'test', 'wide', 'deep', 'dense', 'bnfree'):
        p = os.path.join(rdir, f'learning_proof_l_{split}.json')
        if os.path.exists(p):  # L-class GHN (hid 256 / 16 heads / 12 layers)
            with open(p) as f:  # trained to convergence, same digits protocol
                o = json.load(f)
            lscale[split] = {'predicted': round(o['mean_top1_predicted'], 2),
                             'randinit': round(o['mean_top1_randinit'], 2),
                             'beat_randinit': f"{o['archs_beating_randinit']}"
                                              f"/{o['n_archs']}"}
    if lscale:
        out['l_scale'] = lscale
    uv = {}
    for tag, fname in (('val', 'bnfree_control_uv_val.json'),
                       ('bnfree', 'bnfree_control_uv.json'),
                       ('indist', 'bnfree_control_uv_indist.json')):
        p = os.path.join(rdir, fname)
        if os.path.exists(p):  # unit_var_norm prediction-side fix control
            with open(p) as f:  # (same mixed-norm recipe as bnfree_control)
                o = json.load(f)
            uv[tag] = {'predicted': round(o['mean_top1_predicted'], 2),
                       'randinit': round(o['mean_top1_randinit'], 2),
                       'beat_randinit': f"{o['archs_beating_randinit']}"
                                        f"/{o['n_archs']}"}
    if uv:
        out['unit_var_norm_control'] = uv
    p = os.path.join(rdir, 'nas_demo.json')
    if os.path.exists(p):  # prediction-based NAS on the search split
        with open(p) as f:
            o = json.load(f)
        out['nas_search'] = {
            'candidates': o['num_search'], 'spearman_rho': round(o['spearman_rho'], 3),
            'trained_top1_by_rank_group': {g: round(v['trained'], 2)
                                           for g, v in o['group_means'].items()}}
    p = os.path.join(rdir, 'nas_finetune_score.json')
    if os.path.exists(p):  # 1-ft-epoch NAS score; CI overlaps the zero-cost
        with open(p) as f:  # proxy's rho, so "better" is suggestive only
            o = json.load(f)
        out['nas_finetune_score'] = {
            'spearman_rho_ft': round(o['spearman_rho_ft'], 3),
            'spearman_rho_zero_cost': round(o['spearman_rho_zero'], 3),
            'note': 'ft CI [0.09,0.44] contains the zero-cost rho — '
                    'improvement not significant at n=100'}
    return out


def _run_block(name: str, fn, min_budget_sec: float):
    """Run one optional device detail block under the wall-clock deadline.

    The block runs on a daemon worker thread; if it exceeds its time slice
    (remaining deadline budget) it is marked skipped and the whole process
    emits + exits — a thread stuck inside a cold XLA compile cannot be killed,
    and the device it holds cannot be reused, so continuing would only risk
    the driver's own kill. Returns False when the process must stop."""
    detail = RESULT['detail']
    remaining = _remaining()
    if remaining < min_budget_sec:
        detail[name] = {'skipped': 'deadline',
                        'remaining_sec': round(remaining, 1),
                        'min_budget_sec': min_budget_sec}
        return True
    box = {}

    def work():
        try:
            box['out'] = fn()
        except Exception as e:   # never lose the headline metric
            box['out'] = {'error': repr(e)}

    th = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    th.start()
    th.join(max(10.0, _remaining() - 20.0))
    if th.is_alive():
        detail[name] = {'skipped': 'deadline',
                        'abandoned_after_sec': round(time.time() - t0, 1)}
        return False
    detail[name] = box.get('out')
    return True


def main():
    import jax
    if os.environ.get('GHN3_BENCH_PLATFORM'):
        # offline smoke: the env's sitecustomize registers the TPU plugin at
        # interpreter start, so JAX_PLATFORMS alone cannot force CPU — the
        # jax.config override (before any jax op) is required
        jax.config.update('jax_platforms', os.environ['GHN3_BENCH_PLATFORM'])
    from ghn3_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    RESULT['detail']['platform'] = jax.devices()[0].platform
    RESULT['detail']['device'] = str(jax.devices()[0])
    RESULT['detail']['accuracy_scope'] = (
        'random-init GHN weights; checkpoint-accuracy parity covered by '
        'golden tests offline, not measurable here')

    # the device tunnel occasionally drops a remote_compile response mid-read
    # (transient INTERNAL error); one retry rides the persistent compile cache
    try:
        predict_suite(jax)
    except Exception as e:
        if RESULT['detail'].get('sweep_reps_done'):
            RESULT['detail']['predict_suite_error'] = repr(e)
        else:
            time.sleep(30)
            predict_suite(jax)

    # committed-evidence detail is host-side file reads — record it BEFORE the
    # expensive device blocks so a deadline kill never drops it
    try:
        lp = learning_proof_detail()
        if lp is not None:
            RESULT['detail']['learning_proof'] = lp
    except Exception as e:
        RESULT['detail']['learning_proof'] = {'error': repr(e)}

    if os.environ.get('GHN3_BENCH_FAST', '') != '1':
        # min budgets: meta_train measured ~340 s cold (BENCH_r02), the
        # ImageNet-scale block's hid-256/224px compile is the most expensive
        # in the repo (~17 min/bucket cold, PARITY.md) but minutes warm
        alive = _run_block('meta_train', meta_train_detail, min_budget_sec=420)
        if alive:
            _run_block('imagenet_scale', imagenet_scale_detail,
                       min_budget_sec=300)

    # MFU pass last: lowest-priority budget consumer (see predict_suite)
    if MFU_FN[0] is not None:
        if _remaining() < 60:
            RESULT['detail']['mfu'] = {'skipped': 'deadline'}
        else:
            try:
                MFU_FN[0]()
            except Exception as e:
                RESULT['detail']['mfu'] = {'error': repr(e)}

    _emit()
    if threading.active_count() > 1:
        os._exit(0)   # abandoned watchdog'd block still holds the device


if __name__ == '__main__':
    main()
