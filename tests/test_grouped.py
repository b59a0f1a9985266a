"""Grouped (MoE-style) slot execution: golden equality against the scan-path
interpreter, and trainer-step equality grouped-vs-scan.

The grouped executor (nets/grouped.py) answers the throughput side of the
reference's meta-training workload (/root/reference/ghn3/trainer.py:308-327):
the meta-batch rides the channel axis and every cell slot is a handful of
family-grouped convs instead of per-net ``lax.switch`` dispatch. Numerics
must match the scan path tensor-for-tensor — these tests are the spec.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import grouped as grp
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.parallel.meta_executor import build_interp_batch
from ghn3_tpu.parallel.trainer import Trainer
from ghn3_tpu.predict import forward_embeddings

GENO_A = Genotype(
    normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1), ('conv_5x5', 0), ('skip_connect', 2)],
    normal_concat=[2, 3],
    reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1), ('skip_connect', 0), ('none', 2)],
    reduce_concat=[2, 3])
GENO_B = Genotype(
    normal=[('conv_3x3', 0), ('sep_conv_5x5', 1), ('dil_conv_5x5', 1), ('avg_pool_3x3', 0)],
    normal_concat=[2, 3],
    reduce=[('skip_connect', 1), ('max_pool_3x3', 0), ('conv_1x1', 2), ('sep_conv_3x3', 1)],
    reduce_concat=[2, 3])
GENO_C = Genotype(
    normal=[('cse', 0), ('conv2_5x5', 1), ('skip_connect', 1), ('conv_3x3', 0)],
    normal_concat=[2, 3],
    reduce=[('conv_5x5', 0), ('none', 1), ('dil_conv_3x3', 2), ('avg_pool_3x3', 0)],
    reduce_concat=[2, 3])

# multiplier-1 genotypes: the only family preproc=False admits (cell output
# width == cell input width; reference ops.py Network requires preproc
# otherwise)
GENO_M1_A = Genotype(
    normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1)], normal_concat=[2],
    reduce=[('dil_conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2])
GENO_M1_B = Genotype(
    normal=[('conv_5x5', 0), ('avg_pool_3x3', 1)], normal_concat=[2],
    reduce=[('conv_1x1', 1), ('none', 0)], reduce_concat=[2])
GENO_M1_C = Genotype(
    normal=[('cse', 0), ('conv_3x3', 1)], normal_concat=[2],
    reduce=[('sep_conv_5x5', 0), ('max_pool_3x3', 1)], reduce_concat=[2])

BASE = dict(n_cells=3, ks=3, preproc=True, C_mult=2, fc_layers=1, fc_dim=0,
            stem_type=0, stem_pool=False, norm='bn', glob_avg=True,
            imagenet_stride=4)

# (net_args overrides, per-net widths, is_ghn2, genotypes or None for default)
CASES = {
    # 2 nets, 2 cells, heterogeneous folded widths — the <2 min quick-gate
    # equality case; full-fidelity variants below are `slow`
    'quick_tiny': (dict(n_cells=2), [16, 24], False,
                   (GENO_M1_A, GENO_M1_C)),
    'mixed_folded': (dict(), [16, 24, 32], False, None),
    'imagenet_stem': (dict(stem_type=1, C_mult=1), [16, 16, 24], False, None),
    'stem_pool_fc2': (dict(stem_pool=True, fc_layers=2, fc_dim=24), [16, 24, 24], False, None),
    'bnfree_flat': (dict(norm=None, glob_avg=False), [16, 16, 16], False, None),
    'nopreproc': (dict(preproc=False, C_mult=1), [16, 24, 32], False,
                  (GENO_M1_A, GENO_M1_B, GENO_M1_C)),
    'ghn2_corner': (dict(), [16, 24, 32], True, None),
}
QUICK = ('quick_tiny',)


def _build(case):
    over, widths, is_ghn2, genos = CASES[case]
    genos = genos or (GENO_A, GENO_B, GENO_C)
    cfg = GHNConfig(hid=32, heads=4, layers=2, max_shape=(16, 16, 8, 8),
                    num_classes=10, is_ghn2=is_ghn2)
    params = init_ghn_params(jax.random.PRNGKey(0), cfg)
    graphs = []
    for geno, c in zip(genos, widths):
        net_args = dict(BASE, genotype=geno, C=c, **over)
        net = Network(num_classes=10, is_imagenet_input=False, **net_args)
        g = net.graph_def()
        g.net_args = dict(net_args)
        graphs.append(g)
    vocab = itp.vocab_from_genotypes(list(genos))
    ib = build_interp_batch(cfg, graphs, num_classes=10,
                            is_imagenet_input=False, vocab=vocab)
    assert grp.grouped_supported(ib.bucket)
    return cfg, params, ib


@pytest.mark.parametrize(
    'case', [c if c in QUICK else pytest.param(c, marks=pytest.mark.slow)
             for c in sorted(CASES)])
def test_grouped_matches_scan(case):
    cfg, params, ib = _build(case)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))

    x = forward_embeddings(params, cfg, ib.batch, ib.shape_ind)
    x = x.reshape(len(ib.batch), ib.batch.n_pad, -1)
    arch = jax.tree.map(jnp.asarray, ib.arch)

    logits_ref, pw_ref = [], []
    for i in range(x.shape[0]):
        a_i = jax.tree.map(lambda v: v[i], arch)
        lg, pw = itp.interpret_forward(params, cfg, ib.bucket, x[i], a_i, images)
        logits_ref.append(lg)
        pw_ref.append(pw)
    logits_ref, pw_ref = jnp.stack(logits_ref), jnp.stack(pw_ref)

    logits_g, pw_g = grp.grouped_forward(params, cfg, ib.bucket, x, arch, images)

    np.testing.assert_allclose(np.asarray(logits_g), np.asarray(logits_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(pw_g), np.asarray(pw_ref), rtol=1e-4)


class _Hyper:
    def __init__(self, cfg, params):
        self.config = cfg
        self.params = params


@pytest.mark.slow
def test_trainer_grouped_step_matches_scan():
    # quick_tiny keeps the two jitted train-step compiles (scan + grouped,
    # with grads) tractable on CPU; op-family coverage lives in the
    # forward-equality cases above
    cfg, params, ib = _build('quick_tiny')
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(2,))

    metrics, new_params = {}, {}
    for mode in ('scan', 'grouped'):
        # the jitted step donates params/opt_state buffers — each trainer
        # needs its own copy of the initial params
        p0 = jax.tree_util.tree_map(jnp.array, params)
        trainer = Trainer(ghn=_Hyper(cfg, p0), opt='adamw',
                          opt_args={'lr': 1e-3, 'weight_decay': 1e-2},
                          n_batches=1, predparam_wd=3e-5,
                          label_smoothing=0.1, interp_exec=mode)
        m = trainer.update(images, labels, meta_batch=ib)
        metrics[mode] = {k: v.avg for k, v in m.items()}
        new_params[mode] = trainer.ghn.params

    assert np.isfinite(metrics['scan']['loss'])
    np.testing.assert_allclose(metrics['grouped']['loss'],
                               metrics['scan']['loss'], rtol=1e-4)
    np.testing.assert_allclose(metrics['grouped']['top1'],
                               metrics['scan']['top1'], atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_params['grouped'], new_params['scan'])
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-5


def test_auto_policy_prefers_scan_on_multifamily_vocab():
    # bench vocab: conv+sep_conv+dil_conv = 3 parameterized families ->
    # masked-sum redundancy beats dispatch savings (measured, PARITY.md) ->
    # auto must stay on the scan path
    _cfg, _params, ib = _build('mixed_folded')
    assert grp.grouped_supported(ib.bucket)
    assert not grp.grouped_preferred(ib.bucket)

    # single family at uniform kernel: zero redundant FLOPs -> grouped wins
    single = Genotype(normal=[('conv_3x3', 0), ('max_pool_3x3', 1)],
                      normal_concat=[2],
                      reduce=[('conv_3x3', 0), ('skip_connect', 1)],
                      reduce_concat=[2])
    import dataclasses
    vocab = itp.vocab_from_genotypes([single])
    bucket = dataclasses.replace(ib.bucket, vocab=vocab)
    assert grp.grouped_preferred(bucket)
