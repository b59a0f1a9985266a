"""Evaluation loops: top-1/top-5 inference for functional nets, and the GHN
prediction sweep over architecture suites (reference eval_ghn.py / ppuda infer,
SURVEY §3.4)."""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .utils.logging import log

# Error substrings that mark a *transient* device/tunnel failure (remote TPU
# attachments drop mid-run; the XLA persistent cache makes a retry cheap).
_TRANSIENT = ('remote_compile', 'response body closed', 'UNAVAILABLE',
              'DEADLINE_EXCEEDED', 'Connection reset', 'Socket closed')


def _retry_transient(fn, attempts: int = 3, wait_sec: float = 10.0):
    """Run ``fn()``; on a transient device error, retry up to ``attempts``
    times. Non-transient errors (and the final failure) propagate."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax wraps these as JaxRuntimeError/XlaRuntimeError
            msg = str(e)
            if i + 1 >= attempts or not any(t in msg for t in _TRANSIENT):
                raise
            log(f'transient device error (attempt {i + 1}/{attempts}), '
                f'retrying in {wait_sec:.0f}s: {msg.splitlines()[0][:200]}')
            time.sleep(wait_sec)


def infer(model, params, data, batch_size: int = 64, max_batches: Optional[int] = None,
          seed: int = 0) -> Tuple[float, float]:
    """Top-1/top-5 accuracy of a functional net over a DataSource (eval split).
    ``params`` is a dict or a PackedParams view (zero-copy device buffer)."""
    from .predict import PackedParams
    if isinstance(params, PackedParams):
        view = params
        fwd = jax.jit(lambda buf, x: model(view.with_buffer(buf), x, training=False))
        arg = params.buffer
    else:
        fwd = jax.jit(lambda p, x: model(p, x, training=False))
        arg = params
    top1 = top5 = n = 0
    for bi, (images, labels) in enumerate(data.batches(batch_size, train=False, seed=seed)):
        logits = np.asarray(_retry_transient(lambda: fwd(arg, jnp.asarray(images))))
        top = np.argsort(logits, axis=-1)[:, ::-1][:, :5]
        hits = top == labels[:, None]
        top1 += int(hits[:, :1].any(1).sum())
        top5 += int(hits.any(1).sum())
        n += len(labels)
        if max_batches is not None and bi + 1 >= max_batches:
            break
    return 100.0 * top1 / max(1, n), 100.0 * top5 / max(1, n)


def he_init_params(model, seed: int = 0) -> dict:
    """Standard random initialization for a functional net (He-normal for
    weight tensors, ones/zeros for 1-D norm params) — the random-init baseline
    the GHN papers compare predicted parameters against (reference
    ghn3_results.json `randinit-*` columns; ppuda utils.init surface)."""
    if hasattr(model, 'init_params'):
        return model.init_params(jax.random.PRNGKey(seed))
    params = {}
    names = list(model.named_params())
    keys = jax.random.split(jax.random.PRNGKey(seed), max(1, len(names)))
    for k, (name, shape, _is_w) in zip(keys, names):
        if len(shape) == 1:
            params[name] = jnp.ones(shape) if name.endswith('.weight') \
                else jnp.zeros(shape)
        else:
            fan_in = int(np.prod(shape[1:]))
            params[name] = jax.random.normal(k, shape) * np.sqrt(2.0 / fan_in)
    return params


def chunk_by_params(graphs: Dict[str, object], tables: Dict[str, object],
                    budget: Optional[float] = None) -> List[List[str]]:
    """Node-count-sorted chunks bounded by predicted-parameter budget. One
    packed predict program per chunk: 150M params/chunk keeps every program
    under the 16 GB v5e HBM (measured in bench.py; larger fused programs
    spill, 450M -> 3x slower). Shared by bench.py and the eval sweep so both
    compile the SAME programs (persistent-cache hits).

    ``GHN3_CHUNK_BUDGET`` overrides the default — smaller chunks compile
    faster and checkpoint finer on time-boxed remote-TPU sessions (the wide
    OOD split's 4x-widened nets push single-chunk compile past 10 min)."""
    if budget is None:
        budget = float(os.environ.get('GHN3_CHUNK_BUDGET', 150e6))
    names = sorted(graphs, key=lambda n: graphs[n].n_nodes)
    count = {n: sum(int(np.prod(r.sz)) for cell in tables[n]
                    for r in cell.values()) for n in names}
    chunks, cur, acc = [], [], 0
    for n in names:
        if cur and acc + count[n] > budget:
            chunks.append(cur)
            cur, acc = [], 0
        cur.append(n)
        acc += count[n]
    if cur:
        chunks.append(cur)
    return chunks


def predict_and_eval_suite(ghn, suite: Dict[str, tuple], data=None, batch_size: int = 64,
                           max_batches: Optional[int] = None, norm_tol: float = 1e-2,
                           metadata_name: Optional[str] = None,
                           data_by_imsize: Optional[Dict[int, object]] = None,
                           on_row=None, skip=None) -> List[dict]:
    """Predict parameters for a suite of (torch graph source, functional twin)
    pairs, run norm checks and optionally top-1/top-5 eval.

    :param suite: {arch: (graph_def_or_builder, functional_net)}
    :param data_by_imsize: optional {imsize: DataSource} overrides; a net whose
        ``expected_input_sz`` matches a key evaluates on that loader (the
        reference builds a separate 299px loader for Inception, eval_ghn.py)
    :param on_row: optional callback invoked with each completed row — lets
        long sweeps on remote-attached TPUs persist partial progress
        (tools/learning_proof.py resumes per architecture)
    :param skip: arch names already evaluated by a previous (killed) run.
        Chunking always covers the FULL suite so the packed predict programs
        stay byte-identical to the first pass (persistent-cache hits); a
        chunk whose archs are all in ``skip`` is not predicted at all, and
        per-arch eval (the compile-per-architecture cost that dominates on a
        tunnel-attached chip) runs only for the remainder
    """
    from .graph.graphdef import GraphBatch
    from .predict import predict_packed

    graphs = {}
    for name, (graph, net) in suite.items():
        graphs[name] = graph() if callable(graph) else graph
    all_tables = {name: suite[name][1].param_table() for name in suite}
    chunks = chunk_by_params(graphs, all_tables)

    skip = skip or set()
    results = []
    for names in chunks:
        if all(n in skip for n in names):
            continue
        batch = GraphBatch.from_graphs([graphs[n] for n in names])
        tables = [all_tables[n] for n in names]
        t0 = time.time()

        def _predict():
            out = predict_packed(ghn.params, ghn.config, batch, tables)
            out[0].buffer.block_until_ready()
            return out
        views = _retry_transient(_predict)
        t_predict = time.time() - t0
        # a single host fetch of the packed buffer serves all norm checks
        packed_np = np.asarray(jax.device_get(views[0].buffer))
        for name, view in zip(names, views):
            net = suite[name][1]
            net.predicted = view
            if name in skip:
                continue
            # amortize chunk predict time over the archs actually predicted
            # fresh this pass, so resumed rows don't under-report it
            row = {'arch': name, 'n_nodes': graphs[name].n_nodes,
                   'predict_sec': t_predict / max(
                       1, sum(1 for n in names if n not in skip)),
                   'n_tensors': len(view)}
            norms = [np.linalg.norm(packed_np[o:o + int(np.prod(s))])
                     for o, s in view.spec.values()]
            row['paramnorm'] = float(np.linalg.norm(norms))
            if metadata_name is not None:
                from .metadata import get_metadata
                expected = None
                try:
                    expected = get_metadata(metadata_name, arch=name, attr='paramnorm')
                except KeyError:
                    pass
                row['paramnorm_expected'] = expected
                row['norm_check'] = (expected is not None and
                                     abs(expected - row['paramnorm']) < norm_tol)
            eval_data = (data_by_imsize or {}).get(
                getattr(net, 'expected_input_sz', 224), data)
            if eval_data is not None:
                top1, top5 = infer(net, net.predicted, eval_data,
                                   batch_size=batch_size, max_batches=max_batches)
                row['top1'], row['top5'] = top1, top5
            results.append(row)
            log(' | '.join(f'{k}={v}' for k, v in row.items()))
            if on_row is not None:
                on_row(row)
    return results


def eval_suite_buffered(cfg, suite: Dict[str, tuple], params_of, data,
                        batch_size: int = 128, num_classes: int = 10,
                        is_imagenet_input: bool = False, input_size: int = 32,
                        vocab=None, skip=None, on_row=None,
                        seed: int = 0) -> Dict[str, dict]:
    """Batched top-1/top-5 eval of arbitrary parameter values over a genotype
    suite, through the interpreter's buffer-backed bucket programs.

    The reference evaluates DeepNets-1M splits one architecture at a time
    (eval_ghn.py:94-126); on TPU a per-architecture program is a compile each
    (~minutes through a remote tunnel), which made full 32-arch x 3-arm OOD
    sweeps take hours. Here architectures are grouped by static ArchBucket and
    each group runs ONE compiled program per image-batch shape, with both the
    architecture wiring AND the parameter values streaming through as data
    (nets/interpreter.py BufferFetcher). Nets the interpreter cannot encode
    fall back to the per-arch functional path.

    :param params_of: callable(name) -> {param_name: array} at TRUE shapes
        (He init, a converted predicted view, fine-tuned weights, ...).
    :param suite: {name: (GraphDef, functional_net)} as in predict_and_eval_suite.
    :returns: {name: {'top1': float, 'top5': float, 'loss': float}} — ``loss``
        is the mean cross-entropy of the logits, a continuous score that keeps
        rank resolution where top-1 saturates (prediction-based NAS on easy
        datasets; tools/nas_demo.py). The per-arch fallback path reports
        top1/top5 only.
    """
    results: Dict[str, dict] = {}
    skip = skip or set()

    def emit(name, top1, top5, loss=None):
        row = {'arch': name, 'top1': top1, 'top5': top5}
        if loss is not None:
            row['loss'] = loss
        results[name] = {k: v for k, v in row.items() if k != 'arch'}
        log(f'buffered eval {name}: top1={top1:.2f} top5={top5:.2f}')
        if on_row is not None:
            on_row(row)

    fallback = []
    for grp in _packed_groups(cfg, suite, params_of, num_classes,
                              is_imagenet_input, input_size, vocab, skip,
                              fallback):
        logits_fn = _buffered_logits_fn(cfg, grp.bucket)
        top1 = np.zeros(len(grp.names))
        top5 = np.zeros(len(grp.names))
        ce = np.zeros(len(grp.names))
        n_img = 0
        for images, labels in data.batches(batch_size, train=False, seed=seed):
            lg = np.asarray(_retry_transient(
                lambda: logits_fn(grp.bufs, grp.noffs, grp.arch,
                                  jnp.asarray(images))))
            top = np.argsort(lg, axis=-1)[..., ::-1][..., :5]
            hits = top == labels[None, :, None]
            top1 += hits[..., :1].any(-1).sum(-1)
            top5 += hits.any(-1).sum(-1)
            lse = np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1)) \
                + lg.max(-1)
            ce += (lse - np.take_along_axis(
                lg, labels[None, :, None], axis=-1)[..., 0]).sum(-1)
            n_img += len(labels)
        for i, name in enumerate(grp.names):
            if name in skip:
                continue
            emit(name, 100.0 * top1[i] / max(1, n_img),
                 100.0 * top5[i] / max(1, n_img),
                 float(ce[i]) / max(1, n_img))

    for name in fallback:
        if name in skip:
            continue
        net = suite[name][1]
        t1, t5 = infer(net, params_of(name), data, batch_size=batch_size,
                       seed=seed)
        emit(name, t1, t5)
    return results


class _PackedGroup:
    """One same-bucket slice of a suite, packed for the buffer programs."""

    def __init__(self, bucket, names, ib, bufs, noffs, specs):
        self.bucket = bucket
        self.names = names
        self.ib = ib
        self.bufs = bufs          # (B_meta, L) device array
        self.noffs = noffs        # (B_meta, n_pad) device array
        self.arch = {k: jnp.asarray(v) for k, v in ib.arch.items()}
        self.specs = specs        # per-net unpack specs


def _packed_groups(cfg, suite, params_of, num_classes, is_imagenet_input,
                   input_size, vocab, skip, fallback: list):
    """Group a genotype suite by ArchBucket and pack each group's parameter
    values into (buffer, offsets) arrays; unencodable nets land in ``fallback``."""
    from .nets.interpreter import (EncodeError, bucket_of, max_fetch_elems,
                                   pack_net_params, vocab_from_genotypes)
    from .parallel.meta_executor import build_interp_batch

    if vocab is None:
        vocab = vocab_from_genotypes([g.net_args['genotype']
                                      for g, _net in suite.values()])
    groups: Dict[object, List[str]] = {}
    for name, (g, _net) in suite.items():
        try:
            b = bucket_of(g.net_args, num_classes, is_imagenet_input,
                          vocab=vocab, input_size=input_size)
            groups.setdefault(b, []).append(name)
        except (EncodeError, NotImplementedError, AssertionError, KeyError):
            fallback.append(name)

    for bucket, names in groups.items():
        if all(n in skip for n in names):
            continue
        graphs = [suite[n][0] for n in names]
        try:
            ib = build_interp_batch(cfg, graphs, num_classes=num_classes,
                                    is_imagenet_input=is_imagenet_input,
                                    vocab=vocab, input_size=input_size)
            packs = [pack_net_params(g, ib.bucket, params_of(n))
                     for n, g in zip(names, graphs)]
        except (EncodeError, ValueError, KeyError, NotImplementedError) as e:
            log(f'bucket group {names} falls back to per-arch path: {e!r}')
            fallback.extend(n for n in names if n not in skip)
            continue
        # every switch branch's dynamic_slice is traced with a static size, so
        # the buffer must fit the largest read any branch could issue
        buf_len = max(max(p[1].size for p in packs),
                      max_fetch_elems(ib.bucket))
        bufs = np.zeros((len(names), buf_len), np.float32)
        noffs = np.zeros((len(names), ib.batch.n_pad), np.int32)
        for i, (off, buf, _spec) in enumerate(packs):
            bufs[i, :buf.size] = buf
            noffs[i, :off.size] = off
        yield _PackedGroup(ib.bucket, names, ib, jnp.asarray(bufs),
                           jnp.asarray(noffs), [p[2] for p in packs])


def _buffered_logits_fn(cfg, bucket):
    from .nets.interpreter import BufferFetcher, interpret_forward

    @jax.jit
    def logits_fn(bufs, noffs, arch, images):
        def per_net(carry, xs):
            buf, noff, arch_b = xs
            fe = BufferFetcher(cfg, buf, noff)
            logits, _ = interpret_forward(None, cfg, bucket, None, arch_b,
                                          images, fetcher=fe)
            return carry, logits
        _, out = jax.lax.scan(per_net, jnp.float32(0.0), (bufs, noffs, arch))
        return out                # (B_meta, B, num_classes)

    return logits_fn


def finetune_suite_buffered(cfg, suite: Dict[str, tuple], params_of, data,
                            epochs_eval: List[int], batch_size: int = 64,
                            lr: float = 0.01, wd: float = 3e-5,
                            momentum: float = 0.9, grad_clip: float = 5.0,
                            scheduler: str = 'cosine', seed: int = 0,
                            num_classes: int = 10,
                            is_imagenet_input: bool = False,
                            input_size: int = 32, vocab=None, skip=None,
                            on_row=None) -> Dict[str, dict]:
    """SGD fine-tuning of a whole genotype suite through the buffer-backed
    bucket programs: the packed parameter buffer IS the optimization variable,
    so every net in a bucket trains inside ONE compiled train-step program
    (architecture wiring as data) instead of one forward+backward program per
    architecture. Matches the Trainer's torch-style SGD semantics: per-net
    global-norm grad clip, then coupled weight decay, momentum, per-epoch
    cosine/step LR (reference train_ddp.py recipe; parallel/optim.py).

    Zero-padding invariance: padded buffer regions start at exact zero, their
    activations are zero, and their gradients are zero (zero downstream
    weights), so plain SGD keeps the padding exactly zero — folded-width
    training is exact (asserted by tests/test_buffer_eval.py against the
    per-arch Trainer).

    :param epochs_eval: epoch marks at which to record eval top-1.
    :returns: {name: {'marks': {epoch: top1}, 'params': {...final values...}}}
    """
    from .parallel.optim import lr_multiplier
    from .parallel.trainer import cross_entropy

    skip = skip or set()
    total_epochs = max(epochs_eval)
    results: Dict[str, dict] = {}
    fallback = []
    for grp in _packed_groups(cfg, suite, params_of, num_classes,
                              is_imagenet_input, input_size, vocab, skip,
                              fallback):
        logits_fn = _buffered_logits_fn(cfg, grp.bucket)
        bucket = grp.bucket

        @jax.jit
        def step_fn(bufs, vel, noffs, arch, images, labels, lr_t,
                    _bucket=bucket):
            from .nets.interpreter import BufferFetcher, interpret_forward

            def loss_fn(bufs):
                # remat the per-net forward: without it the scan stores every
                # net's activations for the backward pass at once (B_meta x a
                # full net's residuals), which overflows 16 GB HBM for 32-net
                # buckets; recomputing each net's forward during backward
                # keeps residency at ONE net's activations (HBM-for-FLOPs,
                # the standard TPU trade)
                @jax.checkpoint
                def net_loss(buf, noff, arch_b):
                    fe = BufferFetcher(cfg, buf, noff)
                    logits, _ = interpret_forward(None, cfg, _bucket, None,
                                                  arch_b, images, fetcher=fe)
                    return cross_entropy(logits, labels)

                def per_net(carry, xs):
                    return carry, net_loss(*xs)
                _, losses = jax.lax.scan(per_net, jnp.float32(0.0),
                                         (bufs, noffs, arch))
                return losses.sum(), losses

            (_, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(bufs)
            # per-net global-norm clip (each row is an independent net)
            gn = jnp.sqrt(jnp.sum(g * g, axis=1, keepdims=True))
            g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(gn, 1e-12))
            g = g + wd * bufs                       # coupled weight decay
            new_vel = momentum * vel + g
            new_bufs = bufs - lr_t * new_vel
            # per-net NaN skip (the Trainer's non-finite protocol, row-wise:
            # keep old params AND old optimizer state for that net)
            finite = jnp.isfinite(losses)[:, None]
            new_bufs = jnp.where(finite, new_bufs, bufs)
            new_vel = jnp.where(finite, new_vel, vel)
            return new_bufs, new_vel, losses

        bufs = grp.bufs
        vel = jnp.zeros_like(bufs)
        marks = {name: {} for name in grp.names}
        for epoch in range(total_epochs):
            lr_t = jnp.float32(lr * lr_multiplier(scheduler, epoch,
                                                  total_epochs))
            for images, labels in data.batches(batch_size, train=True,
                                               seed=seed + epoch):
                bufs, vel, _losses = _retry_transient(
                    lambda: step_fn(bufs, vel, grp.noffs, grp.arch,
                                    jnp.asarray(images), jnp.asarray(labels),
                                    lr_t))
            if (epoch + 1) in epochs_eval:
                top1 = np.zeros(len(grp.names))
                n_img = 0
                for images, labels in data.batches(batch_size, train=False,
                                                   seed=seed):
                    lg = np.asarray(_retry_transient(
                        lambda: logits_fn(bufs, grp.noffs, grp.arch,
                                          jnp.asarray(images))))
                    top1 += (lg.argmax(-1) == labels[None, :]).sum(-1)
                    n_img += len(labels)
                for i, name in enumerate(grp.names):
                    marks[name][epoch + 1] = 100.0 * top1[i] / max(1, n_img)
        bufs_np = np.asarray(jax.device_get(bufs))
        from .nets.interpreter import unpack_net_params
        for i, name in enumerate(grp.names):
            if name in skip:
                continue
            row = {'arch': name, 'marks': marks[name],
                   'params': unpack_net_params(grp.specs[i], bufs_np[i])}
            results[name] = row
            log(f'buffered finetune {name}: ' + ' '.join(
                f'ep{e}={v:.2f}' for e, v in sorted(marks[name].items())))
            if on_row is not None:
                on_row(row)

    if fallback:
        raise NotImplementedError(
            f'buffered finetune has no per-arch fallback; unencodable nets: '
            f'{[n for n in fallback if n not in skip]}')
    return results


def params_dict_from_view(view, packed_np: Optional[np.ndarray] = None) -> dict:
    """PackedParams view -> {name: np.ndarray} at true shapes (one host fetch
    of the shared chunk buffer serves every view that references it)."""
    if packed_np is None:
        packed_np = np.asarray(jax.device_get(view.buffer))
    return {name: packed_np[off:off + int(np.prod(shape))].reshape(shape)
            for name, (off, shape) in view.spec.items()}


def adjust_net_f(net, large_input: bool = False):
    """Small-image surgery for functional twins — the JAX side of
    torch_interop.adjust_net (reference eval_ghn.py:145): first strided conv
    -> stride 1, first max-pool -> identity, so CIFAR eval matches the
    reference's adjusted-model graphs."""
    from .nets.functional import Conv2d, MaxPool2d

    net.expected_input_sz = 224 if large_input else 32
    if large_input:
        return net
    done_conv = done_pool = False
    for _, m in net.named_modules():
        if not done_conv and isinstance(m, Conv2d) and max(m.stride) > 1:
            m.stride = (1, 1)
            done_conv = True
        elif done_conv and not done_pool and isinstance(m, MaxPool2d):
            m.k, m.s, m.pad = 1, 1, 0
            done_pool = True
        if done_conv and done_pool:
            break
    return net
