"""Buffer-backed interpreter eval: arbitrary parameter values (He init,
predicted views) evaluated through the bucket-shared interpreter programs.

This is the TPU answer to the reference's per-architecture eval loops
(/root/reference/eval_ghn.py:94-126): one compiled program per ArchBucket with
architecture wiring AND parameter values as data, so a 32-arch x 3-arm OOD
split costs a handful of compiles instead of ~100.

Golden property: BufferFetcher logits == the per-architecture functional
Network forward with the SAME parameter dict, at fp32 tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.evaluate import (eval_suite_buffered, he_init_params, infer,
                               params_dict_from_view)
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.predict import predict_packed

CFG = GHNConfig(hid=32, heads=4, layers=2, max_shape=(16, 16, 8, 8), num_classes=10)
PARAMS = init_ghn_params(jax.random.PRNGKey(0), CFG)

GENO_MIXED = Genotype(
    normal=[('sep_conv_3x3', 0), ('max_pool_3x3', 1), ('conv_5x5', 0), ('skip_connect', 2)],
    normal_concat=[2, 3],
    reduce=[('dil_conv_3x3', 0), ('avg_pool_3x3', 1), ('skip_connect', 0), ('none', 2)],
    reduce_concat=[2, 3])

GENO_SIMPLE = Genotype(
    normal=[('conv_3x3', 0), ('conv_1x1', 1)], normal_concat=[2],
    reduce=[('conv_3x3', 0), ('skip_connect', 1)], reduce_concat=[2])

GENO_VIT = Genotype(
    normal=[('msa', 0), ('skip_connect', 1)], normal_concat=[2],
    reduce=[('msa', 0), ('cse', 1)], reduce_concat=[2])

BASE = dict(C=16, n_cells=4, ks=3, preproc=True, C_mult=2, fc_layers=1, fc_dim=0,
            stem_type=0, stem_pool=False, norm='bn', glob_avg=True, imagenet_stride=4)

CASES = {
    'mixed': dict(BASE, genotype=GENO_MIXED),
    'bnfree': dict(BASE, genotype=GENO_MIXED, norm=None),
    'fc2': dict(BASE, genotype=GENO_SIMPLE, fc_layers=2, fc_dim=24),
    'flatten_head': dict(BASE, genotype=GENO_SIMPLE, glob_avg=False, n_cells=3),
    'vit': dict(BASE, genotype=GENO_VIT, C_mult=1, n_cells=3),
    'imagenet_stem': dict(BASE, genotype=GENO_MIXED, stem_type=1, C_mult=1),
}
# compile-heavy variants stay out of the quick gate; 'mixed' + 'vit' cover
# the folded-CNN and exact-width/msa fetch paths there
_SLOW_CASES = {'bnfree', 'fc2', 'flatten_head', 'imagenet_stem'}
CASE_PARAMS = [pytest.param(c, marks=pytest.mark.slow) if c in _SLOW_CASES
               else c for c in sorted(CASES)]
# the 'mixed' he-init case alone costs ~2 min of CPU compile; vit + the conv
# cases keep quick-gate coverage of the fetcher (mixed still runs under slow)
CASE_PARAMS_HE = [pytest.param(c, marks=pytest.mark.slow)
                  if c in (_SLOW_CASES | {'mixed'}) else c
                  for c in sorted(CASES)]


def _net_and_graph(net_args):
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    graph = net.graph_def()
    graph.net_args = dict(net_args)
    return net, graph


def _buffer_logits(net_args, params_by_name, images, seedless_graph=None):
    net, graph = seedless_graph or _net_and_graph(net_args)
    vocab = itp.vocab_from_genotypes([net_args['genotype']])
    bucket, arch = itp.encode_arch(graph, num_classes=10, cfg=CFG, vocab=vocab)
    offs, buf, _spec = itp.pack_net_params(graph, bucket, params_by_name)
    fe = itp.BufferFetcher(CFG, jnp.asarray(buf), jnp.asarray(offs))
    arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
    logits, predwd = itp.interpret_forward(None, CFG, bucket, None, arch_j,
                                           images, fetcher=fe)
    return np.asarray(logits), float(predwd)


@pytest.mark.parametrize('case', CASE_PARAMS_HE)
def test_buffer_fetcher_matches_network_he_init(case):
    net_args = CASES[case]
    net, graph = _net_and_graph(net_args)
    params = he_init_params(net, seed=3)
    params = {k: np.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    ref = np.asarray(net(params, images, training=False))
    got, predwd = _buffer_logits(net_args, params, images, (net, graph))
    assert np.isfinite(ref).all() and np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert predwd > 0


def test_buffer_fetcher_matches_predicted_view():
    """Predicted params round-trip: GHN decode -> packed view -> dict ->
    buffer program reproduces the decode-fused interpreter/Network logits."""
    net_args = CASES['mixed']
    net, graph = _net_and_graph(net_args)
    batch = GraphBatch.from_graphs([graph])
    views = predict_packed(PARAMS, CFG, batch, [net.param_table()])
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    ref = np.asarray(net(views[0], images, training=False))
    params = params_dict_from_view(views[0])
    got, _ = _buffer_logits(net_args, params, images, (net, graph))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class _TinyData:
    """Deterministic 2-class toy DataSource: class-dependent mean images."""
    num_classes = 10

    def batches(self, batch_size, train=False, seed=0):
        rng = np.random.default_rng(seed)
        n = 48
        labels = np.arange(n) % 10
        images = rng.normal(size=(n, 3, 32, 32)).astype(np.float32) * 0.1
        images += labels[:, None, None, None] * 0.05
        for i in range(0, n, batch_size):
            yield images[i:i + batch_size], labels[i:i + batch_size]


@pytest.mark.slow
def test_eval_suite_buffered_matches_per_arch_infer():
    """The batched driver reproduces per-arch `infer` numbers for every net,
    including two same-bucket nets sharing one program and a second bucket."""
    suite = {}
    args_by_name = {
        'a0': dict(BASE, genotype=GENO_MIXED, n_cells=3),
        'a1': dict(BASE, genotype=GENO_SIMPLE, n_cells=3),   # same bucket as a0
        'b0': dict(BASE, genotype=GENO_SIMPLE, n_cells=2),   # different bucket
    }
    params_by_name = {}
    for i, (name, na) in enumerate(args_by_name.items()):
        net, graph = _net_and_graph(na)
        suite[name] = (graph, net)
        params_by_name[name] = {k: np.asarray(v) for k, v in
                                he_init_params(net, seed=10 + i).items()}
    data = _TinyData()
    rows = []
    got = eval_suite_buffered(CFG, suite, lambda n: params_by_name[n], data,
                              batch_size=32, num_classes=10,
                              on_row=rows.append)
    assert set(got) == set(suite)
    assert len(rows) == len(suite)
    for name, (graph, net) in suite.items():
        t1, t5 = infer(net, params_by_name[name], data, batch_size=32)
        assert abs(got[name]['top1'] - t1) < 1e-6, name
        assert abs(got[name]['top5'] - t5) < 1e-6, name


@pytest.mark.slow
def test_finetune_suite_buffered_matches_trainer():
    """Buffered SGD fine-tuning == the per-arch Trainer with the identical
    recipe (momentum 0.9, coupled wd, global-norm clip, per-epoch cosine):
    final parameter values agree at fp32-accumulation tolerance and the
    recorded top-1 marks match. This is the semantics contract behind
    finetune_suite_buffered's one-program-per-bucket training."""
    from ghn3_tpu.evaluate import finetune_suite_buffered
    from ghn3_tpu.parallel.trainer import Trainer

    net_args = dict(BASE, genotype=GENO_SIMPLE, n_cells=2)
    net, graph = _net_and_graph(net_args)
    params = {k: np.asarray(v) for k, v in he_init_params(net, seed=5).items()}
    data = _TinyData()
    recipe = dict(lr=0.05, wd=3e-5)
    got = finetune_suite_buffered(
        CFG, {'n0': (graph, net)}, lambda n: dict(params), data,
        epochs_eval=[1, 2], batch_size=24, num_classes=10, seed=0,
        lr=recipe['lr'], wd=recipe['wd'])

    trainer = Trainer(model=net,
                      model_params={k: jnp.asarray(v) for k, v in params.items()},
                      opt='sgd',
                      opt_args={'lr': recipe['lr'], 'weight_decay': recipe['wd'],
                                'momentum': 0.9},
                      scheduler='cosine', n_batches=2, epochs=2,
                      log_interval=10 ** 9, seed=0)
    marks = {}
    for epoch in range(2):
        trainer.reset_metrics(epoch)
        for images, labels in data.batches(24, train=True, seed=epoch):
            trainer.update(images, labels)
        trainer.scheduler_step(epoch + 1)
        t1, _t5 = infer(net, trainer.model_params, data, batch_size=24)
        marks[epoch + 1] = t1

    for e in (1, 2):
        assert abs(got['n0']['marks'][e] - marks[e]) <= 100.0 / 48 + 1e-6, \
            (e, got['n0']['marks'], marks)
    fin = got['n0']['params']
    for name, ref in trainer.model_params.items():
        np.testing.assert_allclose(fin[name], np.asarray(ref),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_unpack_net_params_roundtrip():
    """pack -> unpack recovers every tensor bit-exactly at its true shape."""
    net_args = CASES['mixed']
    net, graph = _net_and_graph(net_args)
    params = {k: np.asarray(v) for k, v in he_init_params(net, seed=7).items()}
    vocab = itp.vocab_from_genotypes([net_args['genotype']])
    bucket, _arch = itp.encode_arch(graph, num_classes=10, cfg=CFG, vocab=vocab)
    _offs, buf, spec = itp.pack_net_params(graph, bucket, params)
    out = itp.unpack_net_params(spec, buf)
    assert set(out) == set(params)
    for name in params:
        np.testing.assert_array_equal(out[name], params[name], err_msg=name)


def test_eval_suite_buffered_skip_resume():
    """Archs in `skip` are not re-emitted; remaining archs still evaluate."""
    suite = {}
    for i, geno in enumerate([GENO_MIXED, GENO_SIMPLE]):
        net, graph = _net_and_graph(dict(BASE, genotype=geno, n_cells=3))
        suite[f'n{i}'] = (graph, net)
    params = {n: {k: np.asarray(v) for k, v in
                  he_init_params(net, seed=i).items()}
              for i, (n, (_g, net)) in enumerate(suite.items())}
    data = _TinyData()
    got = eval_suite_buffered(CFG, suite, lambda n: params[n], data,
                              batch_size=32, skip={'n0'})
    assert 'n0' not in got and 'n1' in got
