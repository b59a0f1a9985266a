"""Genotype-as-data super-net executor: golden equality against the
per-architecture executor (predict_packed + nets/darts.Network) and the
zero-recompile property within a bucket.

The interpreter is the TPU answer to the reference's fresh-architectures-every-
step meta-training workload (/root/reference/ghn3/deepnets1m.py:282-319 consumed
at trainer.py:308-327): one compiled program per static bucket, genotype content
as tensor data.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.graph.genotypes import Genotype
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.models.ghn_core import init_ghn_params
from ghn3_tpu.models.shape_encoder import tables_for
from ghn3_tpu.nets.darts import Network
from ghn3_tpu.nets import interpreter as itp
from ghn3_tpu.predict import build_plan, forward_embeddings, predict_packed

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

GENO_CONV2 = Genotype(
    normal=[('conv2_5x5', 0), ('sep_conv_5x5', 1), ('cse', 1), ('dil_conv_5x5', 2)],
    normal_concat=[2, 3],
    reduce=[('max_pool_3x3', 0), ('conv_7x7', 1), ('none', 0), ('skip_connect', 2)],
    reduce_concat=[2, 3])

BASE = dict(C=16, n_cells=4, ks=3, preproc=True, C_mult=2, fc_layers=1, fc_dim=0,
            stem_type=0, stem_pool=False, norm='bn', glob_avg=True, imagenet_stride=4)

CASES = {
    'mixed': dict(BASE, genotype=GENO_MIXED),
    'imagenet_stem': dict(BASE, genotype=GENO_MIXED, stem_type=1, C_mult=1),
    'stem_pool': dict(BASE, genotype=GENO_SIMPLE, stem_pool=True, n_cells=3),
    'vit': dict(BASE, genotype=GENO_VIT, C_mult=1, n_cells=3),
    'bnfree': dict(BASE, genotype=GENO_MIXED, norm=None),
    'flatten_head': dict(BASE, genotype=GENO_SIMPLE, glob_avg=False, n_cells=3),
    'fc2': dict(BASE, genotype=GENO_SIMPLE, fc_layers=2, fc_dim=24),
    'nopreproc': dict(BASE, genotype=GENO_SIMPLE, preproc=False, C_mult=1),
    'conv2_cse': dict(BASE, genotype=GENO_CONV2, n_cells=3),
}


def _run_pair(net_args, n_img=2, imagenet=False):
    net = Network(num_classes=10, is_imagenet_input=imagenet, **net_args)
    graph = net.graph_def()
    graph.net_args = dict(net_args)
    batch = GraphBatch.from_graphs([graph])
    tables = [net.param_table()]
    rng = np.random.default_rng(1)
    sz = 224 if imagenet else 32
    images = jnp.asarray(rng.normal(size=(n_img, 3, sz, sz)).astype(np.float32))

    packed = predict_packed(PARAMS, CFG, batch, tables, sanity_check=True)
    logits_ref = np.asarray(net(packed[0], images, training=True))

    # minimal vocab => small switch tables => fast CPU compiles in CI
    vocab = itp.vocab_from_genotypes([net_args['genotype']])
    bucket, arch = itp.encode_arch(graph, num_classes=10, is_imagenet_input=imagenet,
                                   cfg=CFG, vocab=vocab)
    plan = build_plan(batch, tables, CFG)
    si = np.tile(np.array(tables_for(CFG).dummy_index, np.int32), (batch.n_pad, 1))
    si[:graph.n_nodes] = arch['shape_ind']
    assert np.array_equal(si, plan.shape_ind[0]), 'shape encoder indices diverge'

    x = forward_embeddings(PARAMS, CFG, batch, plan.shape_ind)
    x0 = x.reshape(len(batch), batch.n_pad, -1)[0]
    arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
    logits_int, predwd = itp.interpret_forward(PARAMS, CFG, bucket, x0, arch_j, images)
    return logits_ref, np.asarray(logits_int), float(predwd)


@pytest.mark.parametrize('case', sorted(CASES))
def test_interpreter_matches_network(case):
    ref, got, predwd = _run_pair(CASES[case])
    assert np.isfinite(ref).all() and np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert predwd > 0


def test_interpreter_matches_network_imagenet():
    ref, got, _ = _run_pair(dict(BASE, genotype=GENO_SIMPLE, n_cells=3,
                                 stem_type=1, C_mult=1), imagenet=True)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


RAND_OPS = ('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect',
            'dil_conv_3x3', 'avg_pool_3x3', 'none')
RAND_VOCAB = itp.vocab_from_genotypes([Genotype(
    normal=[(op, 0) for op in RAND_OPS], normal_concat=[2],
    reduce=[], reduce_concat=[])])


def _rand_genotype(rng, steps=2, vocab=RAND_OPS):
    def cell_ops():
        return [(str(rng.choice(list(vocab))), int(rng.integers(0, i // 2 + 2)))
                for i in range(2 * steps)]
    return Genotype(normal=cell_ops(), normal_concat=list(range(2, steps + 2)),
                    reduce=cell_ops(), reduce_concat=list(range(2, steps + 2)))


def test_zero_recompiles_within_bucket():
    """Different genotypes with the same bucket reuse ONE compiled program —
    the property that kills the reference workload's per-meta-batch compile."""
    rng = np.random.default_rng(7)
    nets = []
    while len(nets) < 4:
        geno = _rand_genotype(rng)
        net_args = dict(BASE, genotype=geno, n_cells=3)
        try:
            net = Network(num_classes=10, is_imagenet_input=False, **net_args)
            graph = net.graph_def()
        except Exception:
            continue
        graph.net_args = dict(net_args)
        try:
            bucket, arch = itp.encode_arch(graph, num_classes=10,
                                           is_imagenet_input=False, cfg=CFG,
                                           vocab=RAND_VOCAB)
        except itp.EncodeError:
            continue  # degenerate sample (all-dead concat)
        nets.append((net, graph, bucket, arch))

    buckets = {b for _, _, b, _ in nets}
    assert len(buckets) == 1, 'cases must share one bucket'
    bucket = buckets.pop()

    @jax.jit
    def fwd(x_flat, arch, images):
        return itp.interpret_forward(PARAMS, CFG, bucket, x_flat, arch, images)

    rng2 = np.random.default_rng(3)
    images = jnp.asarray(rng2.normal(size=(2, 3, 32, 32)).astype(np.float32))
    pad_to = max(g.n_nodes for _, g, _, _ in nets)
    pad_to = int(np.ceil(pad_to / 16) * 16)

    outs = []
    for net, graph, _, arch in nets:
        batch = GraphBatch.from_graphs([graph], pad_to=pad_to)
        plan = build_plan(batch, [net.param_table()], CFG)
        x = forward_embeddings(PARAMS, CFG, batch, plan.shape_ind)
        x0 = x.reshape(1, pad_to, -1)[0]
        arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
        logits, _ = fwd(x0, arch_j, images)
        outs.append(np.asarray(logits))

    assert fwd._cache_size() == 1, 'interpreter recompiled within a bucket'
    # different genotypes must actually produce different functions of the input
    assert not np.allclose(outs[0], outs[1], atol=1e-3)


def test_bf16_compute_close_to_f32():
    """cfg.dtype='bfloat16' runs target nets in bf16 (reference --amp autocast
    semantics) with f32 norm statistics; logits stay close to the f32 path and
    the program still dispatches every branch family."""
    import dataclasses
    net_args = CASES['mixed']
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    graph = net.graph_def()
    graph.net_args = dict(net_args)
    batch = GraphBatch.from_graphs([graph])
    vocab = itp.vocab_from_genotypes([net_args['genotype']])
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))

    outs = {}
    for dt in ('float32', 'bfloat16'):
        cfg = dataclasses.replace(CFG, dtype=dt)
        bucket, arch = itp.encode_arch(graph, num_classes=10,
                                       is_imagenet_input=False, cfg=cfg,
                                       vocab=vocab)
        plan = build_plan(batch, [net.param_table()], cfg)
        x = forward_embeddings(PARAMS, cfg, batch, plan.shape_ind)
        x0 = x.reshape(1, batch.n_pad, -1)[0]
        arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
        logits, _ = itp.interpret_forward(PARAMS, cfg, bucket, x0, arch_j, images)
        assert logits.dtype == jnp.float32   # classifier stays f32
        outs[dt] = np.asarray(logits)
    assert np.isfinite(outs['bfloat16']).all()
    np.testing.assert_allclose(outs['bfloat16'], outs['float32'],
                               atol=0.05, rtol=0.1)


def test_bnfree_imagenet_stem_case():
    """norm=None + stem_type=1: the second stem conv is stem0.3 regardless of
    norm (the bn slot holds Identity) — regression for the fixed-index bug the
    round-2 code review found (matches the published dataset naming,
    reference deepnets1m.py:178)."""
    net_args = dict(BASE, genotype=GENO_SIMPLE, stem_type=1, C_mult=1, norm=None,
                    n_cells=3)
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    names = {n for n, _, _ in net.named_params()}
    assert 'stem0.3.weight' in names and 'stem0.2.weight' not in names
    ref, got, _ = _run_pair(net_args)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_ghn2_interpreter_matches_plan_path():
    """cfg.is_ghn2: the interpreter's decode/tiling (corner crops) must equal
    the plan path's — regression for the missing corner=is_ghn2 the round-2
    code review found."""
    import dataclasses
    cfg2 = dataclasses.replace(CFG, is_ghn2=True, layers=0)
    params2 = init_ghn_params(jax.random.PRNGKey(1), cfg2)
    net_args = CASES['mixed']
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    graph = net.graph_def()
    graph.net_args = dict(net_args)
    batch = GraphBatch.from_graphs([graph])
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))

    packed = predict_packed(params2, cfg2, batch, [net.param_table()])
    logits_ref = np.asarray(net(packed[0], images, training=True))

    vocab = itp.vocab_from_genotypes([net_args['genotype']])
    bucket, arch = itp.encode_arch(graph, num_classes=10, is_imagenet_input=False,
                                   cfg=cfg2, vocab=vocab)
    plan = build_plan(batch, [net.param_table()], cfg2)
    x = forward_embeddings(params2, cfg2, batch, plan.shape_ind)
    x0 = x.reshape(1, batch.n_pad, -1)[0]
    arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
    logits_int, _ = itp.interpret_forward(params2, cfg2, bucket, x0, arch_j, images)
    np.testing.assert_allclose(np.asarray(logits_int), logits_ref,
                               atol=1e-4, rtol=1e-4)


def test_custom_input_size_bucketed():
    """--imsize flows into the bucket (static geometry), so nonstandard image
    sizes run instead of producing XLA shape errors — regression for the
    hardcoded-224/32 bug the round-2 code review found."""
    net_args = dict(BASE, genotype=GENO_SIMPLE, n_cells=3)
    net = Network(num_classes=10, is_imagenet_input=False, **net_args)
    graph = net.graph_def()
    graph.net_args = dict(net_args)
    vocab = itp.vocab_from_genotypes([GENO_SIMPLE])
    bucket, arch = itp.encode_arch(graph, num_classes=10, is_imagenet_input=False,
                                   cfg=CFG, vocab=vocab, input_size=48)
    assert bucket.image_size == 48
    batch = GraphBatch.from_graphs([graph])
    plan = build_plan(batch, [net.param_table()], CFG)
    x = forward_embeddings(PARAMS, CFG, batch, plan.shape_ind)
    x0 = x.reshape(1, batch.n_pad, -1)[0]
    arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(size=(2, 3, 48, 48)).astype(np.float32))
    logits, _ = itp.interpret_forward(PARAMS, CFG, bucket, x0, arch_j, images)
    assert logits.shape == (2, 10) and np.isfinite(np.asarray(logits)).all()
    # flatten heads reject nonstandard sizes with a clear error
    flat_args = dict(BASE, genotype=GENO_SIMPLE, glob_avg=False, n_cells=3)
    fnet = Network(num_classes=10, is_imagenet_input=False, **flat_args)
    fgraph = fnet.graph_def()
    fgraph.net_args = dict(flat_args)
    with pytest.raises(itp.EncodeError, match='glob_avg'):
        itp.encode_arch(fgraph, num_classes=10, is_imagenet_input=False,
                        vocab=vocab, input_size=48)


@pytest.mark.slow
def test_width_folding_matches_exact():
    """Nets of different true widths share ONE folded program (same ArchBucket)
    and their folded logits equal the per-architecture executor's. Exactness
    rests on the decoder's slice property (ConvDecoder3 computes the full
    (max0,max1) block; reference nn.py:736-760) and cyclic tiling."""
    buckets = set()
    for c in (20, 24, 31):   # all pad to class 32 (max_shape 16 here)
        args = dict(BASE, genotype=GENO_MIXED, C=c, n_cells=3)
        ref, got, predwd = _run_pair(args)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4,
                                   err_msg=f'C={c}')
        net = Network(num_classes=10, is_imagenet_input=False, **args)
        g = net.graph_def()
        g.net_args = dict(args)
        vocab = itp.vocab_from_genotypes([args['genotype']])
        b, _ = itp.encode_arch(g, num_classes=10, cfg=CFG, vocab=vocab)
        assert b.C == 32 and b.c_folded
        buckets.add(b)
    assert len(buckets) == 1, 'widths must fold into one program'


@pytest.mark.slow
def test_fc_dim_folding_matches_exact():
    buckets = set()
    for fc in (24, 40):      # both pad to FC_CLASSES
        args = dict(BASE, genotype=GENO_SIMPLE, fc_layers=2, fc_dim=fc, n_cells=3)
        ref, got, _ = _run_pair(args)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4,
                                   err_msg=f'fc={fc}')
        net = Network(num_classes=10, is_imagenet_input=False, **args)
        g = net.graph_def()
        g.net_args = dict(args)
        vocab = itp.vocab_from_genotypes([args['genotype']])
        b, _ = itp.encode_arch(g, num_classes=10, cfg=CFG, vocab=vocab)
        assert b.fc_folded
        buckets.add(b)
    assert len(buckets) == 1, 'fc widths must fold into one program'


@pytest.mark.slow
def test_steps_mult_folding_shares_bucket():
    """Genotypes with different step/concat counts fold into one program
    (padded slots run 'none'; padded concat segments are zeroed), and the
    folded logits equal the per-architecture executor's."""
    g1 = Genotype(normal=[('conv_3x3', 0), ('skip_connect', 1)], normal_concat=[2],
                  reduce=[('conv_3x3', 0), ('max_pool_3x3', 1)], reduce_concat=[2])
    # different true step/concat counts than g1, same padded program
    g3 = Genotype(normal=[('conv_3x3', 0), ('skip_connect', 1), ('sep_conv_3x3', 1),
                          ('avg_pool_3x3', 2)], normal_concat=[3],
                  reduce=[('conv_3x3', 0), ('max_pool_3x3', 1), ('skip_connect', 0),
                          ('none', 2)], reduce_concat=[3])
    vocab = itp.vocab_from_genotypes([g1, g3])
    buckets = set()
    for geno in (g1, g3):
        args = dict(BASE, genotype=geno, n_cells=3)
        net = Network(num_classes=10, is_imagenet_input=False, **args)
        g = net.graph_def()
        g.net_args = dict(args)
        b, _ = itp.encode_arch(g, num_classes=10, cfg=CFG, vocab=vocab)
        buckets.add(b)
    assert len(buckets) == 1, 'step/mult variants must share one program'
    b = buckets.pop()
    assert b.sm_folded and b.steps_normal == 2 and b.mult_normal == 2
