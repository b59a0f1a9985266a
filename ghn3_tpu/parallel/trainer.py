"""Unified trainer for GHN meta-training and plain classifier training.

Covers the reference Trainer surface (/root/reference/ghn3/trainer.py:42-440)
redesigned as single-program SPMD:

* data parallelism: params replicated, image batches sharded over the ``data``
  mesh axis; XLA's SPMD partitioner inserts the gradient all-reduce (replaces
  DDP hooks / NCCL).
* meta-batch: the architectures of a step are part of the compiled program
  (every device runs all nets of the step on its image shard — same total
  compute and the same loss definition as the reference's per-rank net split,
  with lower gradient variance). Programs are cached per architecture-pool, so
  training cycles through a pool of compiled meta-batches (see
  docs/DESIGN.md "meta-batch heterogeneity").
* bf16 on TPU replaces AMP + GradScaler (no loss-scaling machinery); the
  reference's NaN cross-rank vote (trainer.py:240-257) collapses to a
  functional skip: non-finite global loss -> parameters pass through unchanged.
* checkpoint/auto-resume with step/epoch + optimizer state, saved every
  ``save_freq`` steps (reference trainer.py:413-432).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GHNConfig
from ..graph.graphdef import GraphBatch
from ..models.ghn_core import ghn_forward
from ..predict import DecodePlan, build_plan, run_plan
from ..utils.logging import AverageMeter, Logger, log
from . import optim as optim_lib
from .mesh import batch_sharding, num_shards, replicated


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    n_cls = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_cls)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) + label_smoothing / n_cls
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(one_hot * logp).sum(-1).mean()


def binary_cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """timm-style BCE-with-logits over one-hot targets (reference bce option)."""
    n_cls = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_cls)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) + label_smoothing / n_cls
    return optax.sigmoid_binary_cross_entropy(logits, one_hot).mean()


def topk_correct(logits, labels, ks=(1, 5)):
    """Top-k hit counts (fractions) — reference ppuda accuracy surface."""
    maxk = max(ks)
    top = jnp.argsort(logits, axis=-1)[:, ::-1][:, :maxk]
    hits = (top == labels[:, None])
    return {k: hits[:, :k].any(axis=1).mean() * 100.0 for k in ks}


def mixup(rng: np.random.Generator, images: np.ndarray, labels: np.ndarray,
          num_classes: int, alpha: float = 0.1, cutmix_alpha: float = 1.0):
    """Host-side mixup/cutmix with soft targets (the reference uses timm
    Mixup(mixup_alpha=0.1, cutmix_alpha=1.0), which picks one of the two per
    batch — trainer.py:96)."""
    perm = rng.permutation(len(images))
    use_cutmix = cutmix_alpha > 0 and rng.random() < 0.5
    if use_cutmix:
        lam = float(rng.beta(cutmix_alpha, cutmix_alpha))
        h, w = images.shape[2], images.shape[3]
        cut = np.sqrt(1.0 - lam)
        ch, cw = int(h * cut), int(w * cut)
        cy, cx = int(rng.integers(h)), int(rng.integers(w))
        y0, y1_ = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
        x0, x1_ = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
        mixed = images.copy()
        mixed[:, :, y0:y1_, x0:x1_] = images[perm][:, :, y0:y1_, x0:x1_]
        lam = 1.0 - (y1_ - y0) * (x1_ - x0) / (h * w)
    else:
        lam = float(rng.beta(alpha, alpha)) if alpha > 0 else 1.0
        mixed = lam * images + (1 - lam) * images[perm]
    y1 = np.eye(num_classes, dtype=np.float32)[labels]
    y2 = y1[perm]
    return mixed.astype(images.dtype), lam * y1 + (1 - lam) * y2


# ---------------------------------------------------------------------------
# meta-training step (GHN)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MetaBatch:
    """A compiled-program unit: a batch of graphs + their functional nets."""
    batch: GraphBatch
    nets: List[Any]                 # functional nets exposing param_table() and __call__
    plan: DecodePlan
    key: Tuple                      # cache key for the jitted step


def build_meta_batch(cfg: GHNConfig, graphs, nets=None) -> MetaBatch:
    if isinstance(graphs, GraphBatch):
        batch = graphs
    else:
        batch = GraphBatch.from_graphs(graphs)
    nets = [g.net for g in batch.graphs] if nets is None else list(nets)
    tables = [n.param_table() for n in nets]
    plan = build_plan(batch, tables, cfg)
    key = (batch.n_pad, len(batch),
           tuple(sorted((k, len(v)) for k, v in plan.groups.items())),
           tuple(id(n) for n in nets))
    return MetaBatch(batch=batch, nets=nets, plan=plan, key=key)


class Trainer:
    """GHN meta-training / classifier training loop helper."""

    def __init__(self,
                 ghn=None,                      # GHN3 instance (meta-training mode)
                 model=None,                    # functional net + params (classifier mode)
                 model_params: Optional[Dict] = None,
                 opt: str = 'adamw',
                 opt_args: Optional[Dict] = None,
                 scheduler: str = 'cosine',
                 scheduler_args: Optional[Dict] = None,
                 n_batches: int = 1000,
                 grad_clip: float = 5.0,
                 auxiliary: bool = False,
                 auxiliary_weight: float = 0.4,
                 label_smoothing: float = 0.0,
                 predparam_wd: float = 0.0,
                 epochs: Optional[int] = None,
                 save_dir: Optional[str] = None,
                 bce: bool = False,
                 mixup_fn: bool = False,
                 amp_bf16: bool = False,
                 log_interval: int = 100,
                 mesh=None,
                 seed: int = 0,
                 checkpoint_backend: str = 'npz',   # 'npz' | 'orbax'
                 interp_vmap: bool = False,
                 interp_exec: str = 'auto',     # 'auto'|'grouped'|'scan'|'vmap'
                 interp_net_unroll: int = 1,
                 net_shard: bool = False,
                 verbose: bool = False):
        assert (ghn is None) != (model is None), 'pass exactly one of ghn / model'
        self.ghn = ghn
        self.model = model
        self.model_params = model_params
        self.is_ghn = ghn is not None
        self.cfg: Optional[GHNConfig] = ghn.config if ghn is not None else None
        if self.is_ghn and amp_bf16:
            self.cfg = dataclasses.replace(self.cfg, dtype='bfloat16')
        self.opt_args = dict(opt_args or {})
        assert 'lr' in self.opt_args, 'learning rate must be specified in opt_args'
        self.base_lr = float(self.opt_args['lr'])
        self.scheduler = scheduler
        self.scheduler_args = scheduler_args
        self.epochs = epochs or 1
        self.n_batches = n_batches
        self.label_smoothing = label_smoothing
        self.predparam_wd = predparam_wd
        self.auxiliary = auxiliary
        self.auxiliary_weight = auxiliary_weight
        self.bce = bce
        self.mixup_rng = np.random.default_rng(seed) if mixup_fn else None
        self.log_interval = log_interval
        self.mesh = mesh
        self.interp_vmap = interp_vmap
        self.interp_exec = 'vmap' if interp_vmap else interp_exec
        # net-sharded DP (the reference's scheme): shard the meta-batch of
        # nets over the data axis, replicate images — for meta_bs >= n_devices
        # regimes where per-device image shards would get tiny
        self.net_shard = net_shard
        # unroll factor of the per-net lax.scan in the interpreter step: the
        # carry is a dummy scalar (iterations are independent), so unrolling
        # lets the XLA scheduler interleave nets whose individual ops are too
        # small to fill the chip — at the cost of an ~unroll-times larger
        # program to compile (see tools/bench_train.py --net-unroll)
        self.interp_net_unroll = max(1, int(interp_net_unroll))
        self.verbose = verbose
        self.save_dir = save_dir
        self.checkpoint_backend = checkpoint_backend
        suffix = 'checkpoint.npz' if checkpoint_backend == 'npz' else 'checkpoint.orbax'
        self.checkpoint_path = os.path.join(save_dir, suffix) if save_dir else None

        self.optimizer = optim_lib.make_optimizer(
            opt, lr=self.base_lr, weight_decay=float(self.opt_args.get('weight_decay', 0.0)),
            momentum=float(self.opt_args.get('momentum', 0.9)), grad_clip=grad_clip)
        self.opt_state = self.optimizer.init(self._params())

        self.start_epoch = 0
        self.start_step = 0
        self._step_count = 0
        self.skipped_updates = 0
        self._step_cache: Dict[Tuple, Callable] = {}
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            self.load_checkpoint(self.checkpoint_path)
        self.reset_metrics(self.start_epoch)

    # ------------------------------------------------------------------
    def _params(self):
        return self.ghn.params if self.is_ghn else self.model_params

    def _set_params(self, p):
        if self.is_ghn:
            self.ghn.params = p
        else:
            self.model_params = p

    def reset_metrics(self, epoch: int):
        self._step = 0
        if epoch > self.start_epoch:
            self.start_step = 0
        self.metrics = {'loss': AverageMeter(), 'top1': AverageMeter(), 'top5': AverageMeter()}
        if self.predparam_wd > 0:
            self.metrics['loss_predwd'] = AverageMeter()
        self.logger = Logger(self.n_batches, start_step=self.start_step)

    def get_lr(self) -> float:
        return optim_lib.get_learning_rate(self.opt_state)

    def scheduler_step(self, epoch: Optional[int] = None):
        epoch = self._epoch if epoch is None else epoch
        mult = optim_lib.lr_multiplier(self.scheduler, epoch, self.epochs,
                                       self.scheduler_args, base_lr=self.base_lr)
        optim_lib.set_learning_rate(self.opt_state, self.base_lr * mult)

    _epoch = 0

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------
    def _loss_from_logits(self, logits, labels):
        if labels.ndim == 2:  # soft targets (mixup)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -(labels * logp).sum(-1).mean()
        fn = binary_cross_entropy if self.bce else cross_entropy
        return fn(logits, labels, self.label_smoothing)

    def _meta_step_fn(self, mb: MetaBatch):
        cfg = self.cfg
        nets, plan = mb.nets, mb.plan
        optimizer = self.optimizer
        predparam_wd = self.predparam_wd

        def step(params, opt_state, node_op, adj, shape_ind, mask, levels,
                 images, labels):
            def loss_fn(p):
                x = ghn_forward(p, cfg, node_op, adj, shape_ind, mask, levels=levels)
                x_flat = x.reshape(-1, cfg.hid)
                for net in nets:
                    net.predicted = {}
                run_plan(p, cfg, x_flat, plan, traced=True)
                losses = []
                logits_all = []
                predwd = 0.0
                for net in nets:
                    out = net(net.predicted, images, training=True)
                    logits, aux = out if isinstance(out, tuple) else (out, None)
                    loss_i = self._loss_from_logits(logits, labels)
                    if aux is not None and self.auxiliary:
                        loss_i = loss_i + self.auxiliary_weight * \
                            self._loss_from_logits(aux, labels)
                    losses.append(loss_i)
                    logits_all.append(logits)
                    if predparam_wd > 0:
                        for t in net.predicted.values():
                            predwd = predwd + jnp.sqrt(jnp.sum(t.astype(jnp.float32) ** 2))
                loss = jnp.mean(jnp.stack(losses))
                loss_predwd = predparam_wd * predwd
                total = loss + loss_predwd
                return total, (jnp.stack(logits_all), loss, loss_predwd)

            (total, (logits_all, loss, loss_predwd)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)

            finite = jnp.isfinite(total)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # non-finite loss: skip the update (replaces the reference's
            # cross-rank NaN vote — single program, no rank divergence)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state)

            hard_labels = labels if labels.ndim == 1 else labels.argmax(-1)
            flat_logits = logits_all.reshape(-1, logits_all.shape[-1])
            rep_labels = jnp.tile(hard_labels, logits_all.shape[0])
            accs = topk_correct(flat_logits, rep_labels)
            metrics = {'loss': loss, 'loss_predwd': loss_predwd,
                       'top1': accs[1], 'top5': accs[5],
                       'skipped': (~finite).astype(jnp.float32)}
            return new_params, new_opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _interp_step_fn(self, ib):
        """Jitted step over the genotype-as-data interpreter (meta_executor):
        compiled once per (bucket, n_pad, B_meta) — fresh architectures every
        step run with zero recompiles (the reference workload, trainer.py:308-327,
        without the per-net retrace)."""
        from ..nets.interpreter import interpret_forward
        cfg = self.cfg
        bucket = ib.bucket
        optimizer = self.optimizer
        predparam_wd = self.predparam_wd

        # remat: recompute each target net's forward during backward instead of
        # storing activations — the meta-batch scan otherwise holds every net's
        # activation set at once and blows HBM at batch 128 (trading ~1.3x
        # FLOPs for ~B_meta x activation memory). Measured non-win: a
        # save_only_these_names('ghn_decoded') policy (decoded weights are
        # parameter-sized and tagged in the interpreter fetchers) benched
        # 0.392 vs 0.373 s/step — per-slot decode recompute is cheap, so plain
        # full remat stays.
        @jax.checkpoint
        def net_fwd(p, x_b, arch_b, images):
            return interpret_forward(p, cfg, bucket, x_b, arch_b, images)

        # Executor choice ('auto' picks the fastest exact path):
        # * grouped — the meta-batch rides the CHANNEL axis; one grouped conv
        #   per op family per slot, no lax.switch, no per-net scan
        #   (nets/grouped.py; the MoE-style slot execution).  Every family
        #   runs for all nets (masked sum), so auto only picks it when the
        #   redundancy is zero: <=1 parameterized family at uniform kernel
        #   (grouped_preferred; measured slower otherwise on a real v5e —
        #   PARITY.md "Grouped slot execution")
        # * scan — sequential per-net loop matching the reference
        #   (trainer.py:308); the default and the fallback for msa/ViT buckets
        # * vmap — executes every switch branch and selects; measured OOM at
        #   recipe scale, kept for small-scale experiments
        from ..nets.grouped import (grouped_forward, grouped_preferred,
                                    grouped_supported)
        vmap_nets = self.interp_exec == 'vmap'
        want_grouped = (grouped_preferred(bucket)
                        if self.interp_exec == 'auto'
                        else self.interp_exec == 'grouped')
        use_grouped = (want_grouped and grouped_supported(bucket)
                       and not (self.net_shard and self.mesh is not None))

        if self.net_shard and self.mesh is not None:
            # net-sharded DP always runs the per-net scan; an explicit
            # interp_exec='grouped' request is overridden rather than
            # validated against the bucket (msa/ViT buckets are fine here)
            return self._interp_step_fn_net_shard(ib, net_fwd)
        if self.interp_exec == 'grouped' and not grouped_supported(bucket):
            raise ValueError('bucket not supported by the grouped executor '
                             '(msa/ViT vocabularies need interp_exec=scan)')

        def step(params, opt_state, node_op, adj, shape_ind, mask, levels,
                 arch, images, labels):
            def loss_fn(p):
                x = ghn_forward(p, cfg, node_op, adj, shape_ind, mask,
                                levels=levels)   # (B, N, hid)

                if use_grouped:
                    # per-cell remat inside; no outer checkpoint needed
                    logits_all, predwds = grouped_forward(
                        p, cfg, bucket, x, arch, images)
                    losses = jax.vmap(
                        lambda lg: self._loss_from_logits(lg, labels))(logits_all)
                elif vmap_nets:
                    logits_all, predwds = jax.vmap(
                        lambda x_b, arch_b: net_fwd(p, x_b, arch_b, images))(x, arch)
                    losses = jax.vmap(
                        lambda lg: self._loss_from_logits(lg, labels))(logits_all)
                else:
                    def per_net(carry, xs):
                        x_b, arch_b = xs
                        logits, predwd = net_fwd(p, x_b, arch_b, images)
                        return carry, (logits,
                                       self._loss_from_logits(logits, labels),
                                       predwd)

                    _, (logits_all, losses, predwds) = jax.lax.scan(
                        per_net, jnp.float32(0.0), (x, arch),
                        unroll=min(self.interp_net_unroll, len(ib.batch)))
                loss = losses.mean()
                loss_predwd = predparam_wd * predwds.sum() if predparam_wd > 0 else 0.0
                return loss + loss_predwd, (logits_all, loss, loss_predwd)

            (total, (logits_all, loss, loss_predwd)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)

            finite = jnp.isfinite(total)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state)

            hard_labels = labels if labels.ndim == 1 else labels.argmax(-1)
            flat_logits = logits_all.reshape(-1, logits_all.shape[-1])
            rep_labels = jnp.tile(hard_labels, logits_all.shape[0])
            accs = topk_correct(flat_logits, rep_labels)
            metrics = {'loss': loss, 'loss_predwd': loss_predwd,
                       'top1': accs[1], 'top5': accs[5],
                       'skipped': (~finite).astype(jnp.float32)}
            return new_params, new_opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _interp_step_fn_net_shard(self, ib, net_fwd):
        """Net-sharded data parallelism (the REFERENCE's scheme): the
        meta-batch of architectures is split over the ``data`` mesh axis — each
        device runs B_meta/n_dev nets on the FULL image batch — instead of
        replicating all nets and sharding images (reference train_ghn_ddp.py:92
        divides meta_bs by world size; graph scatter graph.py:90-241). Grads of
        the replicated params are psum-reduced by shard_map's transpose. Same
        loss/grads as the replicated path (tests/test_shard_step.py)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from ..models.ghn_core import ghn_forward

        cfg = self.cfg
        optimizer = self.optimizer
        predparam_wd = self.predparam_wd
        mesh = self.mesh
        n_dev = num_shards(mesh)
        b_meta = len(ib.batch)
        assert b_meta % n_dev == 0, \
            f'net-sharded DP needs meta_bs ({b_meta}) divisible by devices ({n_dev})'

        def local_nets(p, node_op, adj, shape_ind, mask, levels, arch,
                       images, labels):
            # all per-net args carry the LOCAL shard (B_meta/n_dev leading dim)
            x = ghn_forward(p, cfg, node_op, adj, shape_ind, mask, levels=levels)
            hard = labels if labels.ndim == 1 else labels.argmax(-1)

            def per_net(carry, xs):
                x_b, arch_b = xs
                logits, predwd = net_fwd(p, x_b, arch_b, images)
                accs = topk_correct(logits, hard)
                return carry, (self._loss_from_logits(logits, labels), predwd,
                               accs[1], accs[5])

            _, (losses, predwds, t1, t5) = jax.lax.scan(
                per_net, jnp.float32(0.0), (x, arch),
                unroll=min(self.interp_net_unroll, max(1, b_meta // n_dev)))
            sums = jnp.stack([losses.sum(), predwds.sum(), t1.sum(), t5.sum()])
            return jax.lax.psum(sums, 'data')

        spec_net = P('data')
        sharded_nets = shard_map(
            local_nets, mesh=mesh,
            in_specs=(P(), spec_net, spec_net, spec_net, spec_net, spec_net,
                      spec_net, P(), P()),
            out_specs=P(), check_rep=False)

        def step(params, opt_state, node_op, adj, shape_ind, mask, levels,
                 arch, images, labels):
            def loss_fn(p):
                sums = sharded_nets(p, node_op, adj, shape_ind, mask, levels,
                                    arch, images, labels)
                loss = sums[0] / b_meta
                loss_predwd = predparam_wd * sums[1] if predparam_wd > 0 else 0.0
                return loss + loss_predwd, (loss, loss_predwd,
                                            sums[2] / b_meta, sums[3] / b_meta)

            (total, (loss, loss_predwd, top1, top5)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)

            finite = jnp.isfinite(total)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state)
            metrics = {'loss': loss, 'loss_predwd': loss_predwd,
                       'top1': top1, 'top5': top5,
                       'skipped': (~finite).astype(jnp.float32)}
            return new_params, new_opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _model_step_fn(self):
        model = self.model
        optimizer = self.optimizer

        def step(params, opt_state, images, labels):
            def loss_fn(p):
                out = model(p, images, training=True)
                logits, aux = out if isinstance(out, tuple) else (out, None)
                loss = self._loss_from_logits(logits, labels)
                if aux is not None and self.auxiliary:
                    loss = loss + self.auxiliary_weight * self._loss_from_logits(aux, labels)
                return loss, logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            finite = jnp.isfinite(loss)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state)
            hard_labels = labels if labels.ndim == 1 else labels.argmax(-1)
            accs = topk_correct(logits, hard_labels)
            metrics = {'loss': loss, 'top1': accs[1], 'top5': accs[5],
                       'skipped': (~finite).astype(jnp.float32)}
            return new_params, new_opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def update(self, images, labels, meta_batch: Optional[MetaBatch] = None):
        """One optimization step. ``meta_batch`` selects GHN meta-training."""
        images = np.asarray(images)
        labels = np.asarray(labels)
        if self.mixup_rng is not None:
            n_cls = self.cfg.num_classes if self.is_ghn else None
            if n_cls is None:
                n_cls = int(labels.max()) + 1
            images, labels = mixup(self.mixup_rng, images, labels, n_cls)

        if self.mesh is not None and not (self.net_shard and self.is_ghn):
            images = jax.device_put(images, batch_sharding(self.mesh))
            labels = jax.device_put(labels, batch_sharding(self.mesh))

        if self.is_ghn:
            assert meta_batch is not None
            from .meta_executor import InterpMetaBatch
            from ..predict import batch_levels
            b = meta_batch.batch
            levels = jnp.asarray(batch_levels(b)) if self.cfg.is_ghn2 \
                else jnp.zeros_like(jnp.asarray(b.node_op))
            if isinstance(meta_batch, InterpMetaBatch):
                if meta_batch.key not in self._step_cache:
                    self._step_cache[meta_batch.key] = self._interp_step_fn(meta_batch)
                step_fn = self._step_cache[meta_batch.key]
                arch = {k: jnp.asarray(v) for k, v in meta_batch.arch.items()}
                new_params, self.opt_state, m = step_fn(
                    self._params(), self.opt_state, jnp.asarray(b.node_op),
                    jnp.asarray(b.adj), jnp.asarray(meta_batch.shape_ind),
                    jnp.asarray(b.mask), levels, arch, images, labels)
                return self._finish_update(new_params, m, len(labels))
            if meta_batch.key not in self._step_cache:
                self._step_cache[meta_batch.key] = self._meta_step_fn(meta_batch)
            step_fn = self._step_cache[meta_batch.key]
            new_params, self.opt_state, m = step_fn(
                self._params(), self.opt_state, jnp.asarray(b.node_op), jnp.asarray(b.adj),
                jnp.asarray(meta_batch.plan.shape_ind), jnp.asarray(b.mask), levels,
                images, labels)
        else:
            if () not in self._step_cache:
                self._step_cache[()] = self._model_step_fn()
            new_params, self.opt_state, m = self._step_cache[()](
                self._params(), self.opt_state, images, labels)

        return self._finish_update(new_params, m, len(labels))

    def _finish_update(self, new_params, m, n):
        self._set_params(new_params)
        m = {k: float(v) for k, v in m.items()}
        self.skipped_updates += int(m.pop('skipped', 0))
        for k, meter in self.metrics.items():
            if k in m:
                meter.update(m[k], n)
        self._step += 1
        self._step_count += 1
        return self.metrics

    # ------------------------------------------------------------------
    def save(self, epoch: int, step: int, config: Optional[dict] = None,
             save_freq: int = 300, interm_epoch: int = 5, epoch_freq: int = 1):
        if self.checkpoint_path is None:
            return
        at_epoch_end = step == self.n_batches - 1
        if not (((step + 1) % save_freq == 0) or at_epoch_end):
            return
        if jax.process_index() != 0:
            return
        # epoch_freq > 1 skips the epoch-end resume checkpoint on most epochs:
        # with short epochs (few steps) the full-trainer-state write dominates
        # wall time (reference saves every 300 steps, trainer.py:413-416 — one
        # epoch here can be far fewer steps than that).  Mid-epoch save_freq
        # saves are unaffected; a crash costs at most epoch_freq epochs.
        if at_epoch_end and (epoch + 1) % epoch_freq != 0 and epoch != 0:
            if (epoch + 1) % interm_epoch != 0:
                return
        else:
            self._write_checkpoint(self.checkpoint_path, epoch, step, config)
            log(f'\nsaved the checkpoint to {self.checkpoint_path} at epoch={epoch}, step={step}')
        if (epoch + 1) % interm_epoch == 0 or epoch == 0:
            interm = self.checkpoint_path.replace('.npz', '_epoch%d.npz' % (epoch + 1))
            self._write_checkpoint(interm, epoch, step, config)
            log(f'saved the intermediate checkpoint to {interm}')

    def _write_checkpoint(self, path: str, epoch: int, step: int, config):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if self.checkpoint_backend == 'orbax':
            from . import orbax_ckpt
            orbax_ckpt.save(path, {k: np.asarray(v) for k, v in self._params().items()},
                            opt_state=self.opt_state,
                            meta={'epoch': epoch, 'step': step, 'config': config or {}})
            return
        params = {k: np.asarray(v) for k, v in self._params().items()}
        flat, treedef = jax.tree_util.tree_flatten(self.opt_state)
        payload = dict(params)
        payload['__meta__'] = np.array({'epoch': epoch, 'step': step,
                                        'config': config or {},
                                        'opt_treedef': pickle.dumps(treedef)}, dtype=object)
        for i, leaf in enumerate(flat):
            payload[f'__opt__{i}'] = np.asarray(leaf)
        tmp = path + '.tmp.npz'
        np.savez(tmp, **payload)
        os.replace(tmp, path)

    def load_checkpoint(self, path: str):
        if self.checkpoint_backend == 'orbax':
            from . import orbax_ckpt
            import jax.numpy as _jnp
            params, opt_state, meta = orbax_ckpt.restore(path)
            self._set_params({k: _jnp.asarray(v) for k, v in params.items()})
            if opt_state is not None:
                self.opt_state = opt_state
            self.start_epoch = int(meta.get('epoch', 0))
            self.start_step = int(meta.get('step', 0))
            log(f'resumed from {path} (orbax): epoch {self.start_epoch}, step {self.start_step}')
            self._finish_resume()
            return
        data = np.load(path, allow_pickle=True)
        meta = data['__meta__'].item()
        params = {k: jnp.asarray(data[k]) for k in data.files
                  if not k.startswith('__')}
        self._set_params(params)
        flat = []
        i = 0
        while f'__opt__{i}' in data:
            flat.append(jnp.asarray(data[f'__opt__{i}']))
            i += 1
        treedef = pickle.loads(meta['opt_treedef'])
        self.opt_state = jax.tree_util.tree_unflatten(treedef, flat)
        self.start_epoch = int(meta['epoch'])
        self.start_step = int(meta['step'])
        log(f'resumed from {path}: epoch {self.start_epoch}, step {self.start_step}')
        self._finish_resume()

    def _finish_resume(self):
        # fast-forward the schedule and the resume point (reference trainer.py:215-229)
        if self.start_epoch > 0:
            self._epoch = self.start_epoch
            self.scheduler_step(self.start_epoch)
        if self.start_step >= self.n_batches - 1:
            self.start_step = 0
            self.start_epoch += 1
        else:
            self.start_step += 1

    def log(self, step: Optional[int] = None):
        s = self._step if step is None else (step + 1)
        if s % self.log_interval == 0 or s >= self.n_batches - 1 or s == 1:
            self.logger(s, {k: v.avg for k, v in self.metrics.items()})
