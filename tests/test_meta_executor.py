"""Compile-scalable meta-training: the Trainer streams unique architectures
every step through the genotype-as-data executor with a bounded program cache
(the reference workload — fresh nets per step from the infinite sampler,
/root/reference/ghn3/deepnets1m.py:282-319 + trainer.py:308-327)."""
import numpy as np
import jax
import jax.numpy as jnp

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.graph.genotypes import Genotype, random_genotype
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.parallel.meta_executor import BucketQueue, build_interp_batch
from ghn3_tpu.parallel.trainer import Trainer

CFG = GHNConfig(hid=32, heads=4, layers=2, max_shape=(16, 16, 8, 8), num_classes=10)

OPS = ('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect', 'none')
VOCAB = itp.vocab_from_genotypes([Genotype(normal=[(o, 0) for o in OPS],
                                           normal_concat=[2], reduce=[],
                                           reduce_concat=[])])


class _Hyper:
    def __init__(self, cfg, params):
        self.config = cfg
        self.params = params


def _graph_stream(rng, n, C=16, n_cells=3):
    out = []
    while len(out) < n:
        geno = random_genotype(rng, steps=2, ops=OPS)
        net_args = dict(genotype=geno, C=C, n_cells=n_cells, ks=3, preproc=True,
                        C_mult=2, fc_layers=1, fc_dim=0, stem_type=0,
                        stem_pool=False, norm='bn', glob_avg=True,
                        imagenet_stride=4)
        try:
            net = Network(num_classes=10, is_imagenet_input=False, **net_args)
            g = net.graph_def()
        except Exception:
            continue
        g.net_args = dict(net_args)
        try:
            itp.encode_arch(g, num_classes=10, is_imagenet_input=False, vocab=VOCAB)
        except itp.EncodeError:
            continue
        out.append(g)
    return out


def test_trainer_streams_unique_archs_zero_recompiles():
    rng = np.random.default_rng(11)
    graphs = _graph_stream(rng, 8)
    assert len({id(g.net_args['genotype']) for g in graphs}) == 8

    params = init_ghn_params(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(ghn=_Hyper(CFG, params), opt='adamw',
                      opt_args={'lr': 1e-3, 'weight_decay': 1e-2},
                      n_batches=4, predparam_wd=3e-5, label_smoothing=0.1)

    img_rng = np.random.default_rng(5)
    images = img_rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    labels = img_rng.integers(0, 10, size=(4,))

    pad_to = int(np.ceil(max(g.n_nodes for g in graphs) / 16) * 16)
    losses = []
    for step in range(4):
        group = graphs[2 * step: 2 * step + 2]
        ib = build_interp_batch(CFG, group, num_classes=10,
                                is_imagenet_input=False, vocab=VOCAB,
                                pad_to=pad_to)
        m = trainer.update(images, labels, meta_batch=ib)
        losses.append(m['loss'].avg)

    # 4 steps x 2 unique nets each = 8 unique architectures, ONE compiled program
    assert len(trainer._step_cache) == 1, 'meta step recompiled per architecture'
    assert all(np.isfinite(l) for l in losses)
    assert trainer.skipped_updates == 0


def test_bucket_queue_groups_and_flushes():
    rng = np.random.default_rng(3)
    q = BucketQueue(meta_batch_size=2, num_classes=10, is_imagenet_input=False,
                    patience=3, vocab=VOCAB)
    # widths fold into one program now; distinct buckets come from n_cells
    g16 = _graph_stream(rng, 3, n_cells=3)
    g32 = _graph_stream(rng, 1, n_cells=4)

    assert q.push(g16[0]) is None
    batch = q.push(g16[1])
    assert batch is not None and len(batch) == 2      # same bucket fills

    assert q.push(g32[0]) is None                     # lone C=32 net waits
    outs = []
    for g in _graph_stream(rng, 4, n_cells=3):        # age the lone queue out
        out = q.push(g)
        if out is not None:
            outs.append(out)
    flushed = [o for o in outs if o[0] is g32[0]]
    assert flushed, 'stale bucket was never flushed'
    assert len(flushed[0]) == 2 and flushed[0][1] is g32[0]   # cycled to fill


def test_net_sharded_dp_matches_replicated():
    """Net-sharded DP (meta-batch split over the data axis, images replicated
    — the reference's scheme, train_ghn_ddp.py:92) produces the same loss and
    updated parameters as the replicated-nets/sharded-images path. Node-count
    balancing is moot here: every net in a bucket-homogeneous batch runs the
    same padded dense program, so per-device work is identical by construction.
    """
    import pytest
    from ghn3_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device CPU mesh')
    rng = np.random.default_rng(21)
    graphs = _graph_stream(rng, 8, n_cells=2)
    mesh = data_mesh(8)

    img_rng = np.random.default_rng(5)
    images = img_rng.normal(size=(8, 3, 32, 32)).astype(np.float32)
    labels = img_rng.integers(0, 10, size=(8,))
    pad_to = int(np.ceil(max(g.n_nodes for g in graphs) / 16) * 16)
    ib = build_interp_batch(CFG, graphs, num_classes=10,
                            is_imagenet_input=False, vocab=VOCAB, pad_to=pad_to)

    results = {}
    for net_shard in (False, True):
        params = init_ghn_params(jax.random.PRNGKey(0), CFG)
        # sgd: updated params differ exactly by lr*grad, so this compares
        # GRADIENTS across the two schemes (adam's first-step m/sqrt(v) = +-1
        # turns float-noise grads on dead elements into +-lr flips)
        trainer = Trainer(ghn=_Hyper(CFG, params), opt='sgd',
                          opt_args={'lr': 1e-2, 'weight_decay': 0.0},
                          n_batches=1, predparam_wd=3e-5, mesh=mesh,
                          net_shard=net_shard)
        m = trainer.update(images, labels, meta_batch=ib)
        results[net_shard] = (m['loss'].avg, trainer._params())

    loss_rep, p_rep = results[False]
    loss_sh, p_sh = results[True]
    assert abs(loss_rep - loss_sh) < 1e-5, (loss_rep, loss_sh)
    for k in p_rep:
        np.testing.assert_allclose(np.asarray(p_sh[k]), np.asarray(p_rep[k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)
