"""Meta-training executor over the genotype-as-data interpreter.

This is the compile-scalable path for the reference's core workload — a fresh
meta-batch of architectures sampled from DeepNets-1M every step
(/root/reference/ghn3/deepnets1m.py:282-319 consumed at trainer.py:308-327).
One XLA program is compiled per (ArchBucket, n_pad, batch shapes) signature;
genotype content streams through as tensor data, so after warmup the trainer
sustains its steady-state step time with ZERO recompiles regardless of how many
unique architectures it sees (tests/test_meta_executor.py, tools/bench_train.py).

Pieces:

* :func:`build_interp_batch` — encode + stack a same-bucket list of graphs into
  one device-feedable `InterpMetaBatch`.
* :class:`BucketQueue` — regroups an architecture stream into bucket-homogeneous
  meta-batches (the TPU adaptation of the reference's NetBatchSamplerDDP, which
  has no same-shape requirement because torch retraces every net anyway).
* Trainer integration lives in trainer.Trainer._interp_step_fn (same optimizer /
  NaN-skip / metrics machinery as the pool path).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import GHNConfig
from ..graph.graphdef import GraphBatch, GraphDef, bucket_size
from ..models.shape_encoder import tables_for
from ..nets.interpreter import ArchBucket, EncodeError, bucket_of, encode_arch


@dataclasses.dataclass
class InterpMetaBatch:
    """One step's worth of same-bucket architectures, ready for the jitted step."""
    batch: GraphBatch
    bucket: ArchBucket
    arch: Dict[str, np.ndarray]      # each (B_meta, ...) stacked arch-data arrays
    shape_ind: np.ndarray            # (B_meta, N_pad, 4)
    key: Tuple                       # program-cache key: (bucket, n_pad, B_meta)


def build_interp_batch(cfg: GHNConfig, graphs: Sequence[GraphDef],
                       num_classes: int = 10, is_imagenet_input: bool = False,
                       vocab=None, pad_to: Optional[int] = None,
                       input_size: int = 0) -> InterpMetaBatch:
    """Encode + stack same-bucket graphs. Raises EncodeError on degenerate nets
    and ValueError if the graphs span more than one bucket."""
    kw = {} if vocab is None else {'vocab': tuple(vocab)}
    encoded = [encode_arch(g, num_classes=num_classes,
                           is_imagenet_input=is_imagenet_input, cfg=cfg,
                           input_size=input_size, **kw)
               for g in graphs]
    buckets = {b for b, _ in encoded}
    if len(buckets) != 1:
        raise ValueError(f'graphs span {len(buckets)} buckets; regroup first')
    bucket = buckets.pop()

    batch = GraphBatch.from_graphs(list(graphs), pad_to=pad_to)
    n_pad = batch.n_pad
    dummy = np.array(tables_for(cfg).dummy_index, np.int32)
    shape_ind = np.tile(dummy, (len(graphs), n_pad, 1))
    stacked: Dict[str, List[np.ndarray]] = {}
    for i, ((_b, arch), g) in enumerate(zip(encoded, graphs)):
        shape_ind[i, :g.n_nodes] = arch.pop('shape_ind')
        for k, v in arch.items():
            stacked.setdefault(k, []).append(v)
    arch_stacked = {k: np.stack(v) for k, v in stacked.items()}
    key = (bucket, n_pad, len(graphs))
    return InterpMetaBatch(batch=batch, bucket=bucket, arch=arch_stacked,
                           shape_ind=shape_ind, key=key)


class BucketQueue:
    """Regroup an architecture stream into fixed-size same-bucket meta-batches.

    Streams are bucket-heterogeneous (the width randomization draws C per sample,
    reference deepnets1m.py:99-133). ``push`` returns a full batch as soon as one
    bucket accumulates ``meta_batch_size`` graphs. A bucket that stalls for
    ``patience`` pushes is flushed by cycling its members (repeating a net within
    a meta-batch is semantically fine — the reference's loss is a mean over nets).
    """

    def __init__(self, meta_batch_size: int, num_classes: int = 10,
                 is_imagenet_input: bool = False, patience=None,
                 vocab=None, input_size: int = 0):
        self.meta_batch_size = meta_batch_size
        self.num_classes = num_classes
        self.is_imagenet_input = is_imagenet_input
        # patience=None is adaptive: a bucket is only flushed after enough
        # pushes that it plausibly COULD have filled — 2 fills' worth given the
        # currently active bucket count. A fixed patience over-flushes as soon
        # as the bucket count grows (measured: dup_rate 0.55 at 48 buckets with
        # patience 64 vs <0.02 adaptive; tools/queue_stats.py)
        self.patience = patience
        self.vocab = vocab
        self.input_size = input_size
        self._queues: Dict[ArchBucket, List[GraphDef]] = {}
        self._age: Dict[ArchBucket, int] = {}
        # sampling-fidelity counters (dup_slots counts meta-batch slots filled
        # by cycling a stalled bucket's members; see docs/DESIGN.md §9 and
        # tools/queue_stats.py for the measured deviation vs the reference's
        # uniform shuffled batches)
        self.stats = {'batches': 0, 'slots': 0, 'dup_slots': 0, 'flushes': 0}

    def _bucket(self, g: GraphDef) -> ArchBucket:
        kw = {} if self.vocab is None else {'vocab': tuple(self.vocab)}
        return bucket_of(g.net_args, self.num_classes, self.is_imagenet_input,
                         input_size=self.input_size, **kw)

    def push(self, g: GraphDef) -> Optional[List[GraphDef]]:
        b = self._bucket(g)
        q = self._queues.setdefault(b, [])
        q.append(g)
        self._age[b] = 0
        for other in self._age:
            if other != b:
                self._age[other] += 1
        if len(q) >= self.meta_batch_size:
            del self._queues[b], self._age[b]
            self.stats['batches'] += 1
            self.stats['slots'] += self.meta_batch_size
            return q[:self.meta_batch_size]
        patience = self.patience if self.patience is not None else \
            max(64, 2 * self.meta_batch_size * max(1, len(self._queues)))
        for ob, age in self._age.items():
            if age >= patience:
                oq = self._queues.pop(ob)
                del self._age[ob]
                n0, i = len(oq), 0
                while len(oq) < self.meta_batch_size:   # cycle members to fill
                    oq.append(oq[i % n0])
                    i += 1
                self.stats['batches'] += 1
                self.stats['slots'] += self.meta_batch_size
                self.stats['dup_slots'] += self.meta_batch_size - n0
                self.stats['flushes'] += 1
                return oq[:self.meta_batch_size]
        return None


def stream_interp_batches(dataset, sampler, cfg: GHNConfig,
                          meta_batch_size: int,
                          num_classes: int = 10,
                          is_imagenet_input: bool = False,
                          patience=None,
                          vocab=None,
                          pad_buckets: Tuple[int, ...] = None,
                          input_size: int = 0,
                          ) -> Iterator[InterpMetaBatch]:
    """dataset items (via sampler index batches) -> InterpMetaBatch stream.

    The NodeBudgetSampler's batches are flattened into a single architecture
    stream and regrouped by bucket, so a regrouped batch could exceed the node
    budget the sampler enforces; over-budget groups are REJECTED here exactly
    like the sampler rejects its own over-budget batches (reference
    NetBatchSamplerDDP.check_batch, deepnets1m.py:294-301).
    """
    queue = BucketQueue(meta_batch_size, num_classes=num_classes,
                        is_imagenet_input=is_imagenet_input, patience=patience,
                        vocab=vocab, input_size=input_size)
    budget = getattr(sampler, 'max_nodes_batch', None)
    for idx_batch in sampler:
        for idx in idx_batch:
            g = dataset[int(idx)]
            group = queue.push(g)
            if group is None:
                continue
            if budget is not None and sum(gg.n_nodes for gg in group) > budget:
                continue     # reject over-budget regrouped batches (see docstring)
            pad_to = None
            if pad_buckets is not None:
                n_max = max(gg.n_nodes for gg in group)
                pad_to = bucket_size(n_max, pad_buckets)
            try:
                yield build_interp_batch(cfg, group, num_classes=num_classes,
                                         is_imagenet_input=is_imagenet_input,
                                         vocab=vocab, pad_to=pad_to,
                                         input_size=input_size)
            except EncodeError:
                continue     # degenerate sample slipped through; drop the group
