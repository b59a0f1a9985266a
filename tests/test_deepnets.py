"""DeepNets-1M pipeline: stored-record decode, functional Network matching,
prediction, and a meta-training step on genotype architectures."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from conftest import reference_available

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.predict import build_plan, predict_batch

pytestmark = pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')

CFG = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11), num_classes=10)


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    from deepnets_fixture import build_fixture
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    nets_dir = str(tmp_path_factory.mktemp('deepnets'))
    build_fixture(nets_dir)
    return DeepNets1M(split='train', nets_dir=nets_dir, wider_nets=False, seed=0)


def test_decode_matches_reference_graph(dataset):
    """Stored-record decode must reproduce the reference-traced graph."""
    from conftest import enable_reference_import
    enable_reference_import()
    from ghn3.graph import Graph
    from ghn3.ops import Network as RefNetwork
    from ppuda.deepnets1m.genotypes import from_dict
    from deepnets_fixture import GENOTYPES

    for i, (geno_dict, args) in enumerate(GENOTYPES):
        g_ours = dataset[i]
        net = RefNetwork(genotype=from_dict(geno_dict), num_classes=10,
                         is_imagenet_input=False, imagenet_stride=4,
                         auxiliary=False, **args)
        g_ref = Graph(net, ve_cutoff=50)
        assert g_ours.n_nodes == g_ref.n_nodes
        np.testing.assert_array_equal(g_ours.node_op, g_ref.node_feat.numpy().reshape(-1))
        np.testing.assert_array_equal(g_ours.adj, g_ref._Adj.numpy())
        # node_info names must line up with the reference's traced names
        ref_rows = {row[0]: row[1] for cell in g_ref.node_info for row in cell}
        our_rows = {r.node_ind: r.param_name for cell in g_ours.node_info for r in cell}
        for node_ind, name in our_rows.items():
            if node_ind in ref_rows:
                if name.find('pool') >= 0:
                    # pools: the reference's traced path stores the bare primitive
                    # while its decode path prefixes 'cells.<i>.'; both are
                    # unmatched placeholder names, so compare the primitive only
                    assert name.split('.')[-1] == ref_rows[node_ind].split('.')[-1]
                else:
                    assert name == ref_rows[node_ind], (i, node_ind, name, ref_rows[node_ind])


def test_plan_matches_functional_network(dataset):
    """Every predictable graph node must match a functional Network parameter."""
    for i in range(3):
        g = dataset[i]
        assert g.net is not None  # train split attaches skeletons
        batch = GraphBatch.from_graphs([g])
        plan = build_plan(batch, [g.net.param_table()], CFG, sanity_check=True)
        n_matched = sum(len(v) for v in plan.groups.values())
        assert n_matched > 0
        # all declared weights are predicted (norm biases ride along with weights)
        predicted_names = set()
        for items in plan.groups.values():
            predicted_names.update(id(it.record) for it in items)


def test_predict_and_forward(dataset):
    ghn = GHN3(CFG, seed=0)
    g = dataset[0]
    net = g.net
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g]), [net.param_table()])
    missing = [n for n, _, _ in net.named_params() if n not in net.predicted]
    assert not missing, f'unpredicted params: {missing[:8]}'
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32))
    logits = net(net.predicted, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_meta_training_step_on_deepnets(dataset):
    from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch
    ghn = GHN3(CFG, seed=0)
    graphs = [dataset[0], dataset[2]]  # conv net + msa net
    mb = build_meta_batch(CFG, GraphBatch.from_graphs(graphs))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=2, epochs=1, predparam_wd=3e-5)
    m = trainer.update(images, labels, meta_batch=mb)
    assert np.isfinite(m['loss'].avg)


def test_interpreter_on_dataset_records(dataset):
    """The genotype-as-data executor consumes dataset-decoded records directly:
    logits match predict_packed + the attached functional Network."""
    from ghn3_tpu.nets import interpreter as itp
    from ghn3_tpu.predict import build_plan, forward_embeddings, predict_packed

    ghn = GHN3(CFG, seed=0)
    vocab = dataset.interpreter_vocab()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))

    for i in range(3):
        g = dataset[i]
        net = g.net
        batch = GraphBatch.from_graphs([g])
        packed = predict_packed(ghn.params, CFG, batch, [net.param_table()],
                                sanity_check=True)
        logits_ref = np.asarray(net(packed[0], images, training=True))

        bucket, arch = itp.encode_arch(g, num_classes=10, is_imagenet_input=False,
                                       cfg=CFG, vocab=vocab)
        plan = build_plan(batch, [net.param_table()], CFG)
        si = np.asarray(plan.shape_ind[0][:g.n_nodes])
        np.testing.assert_array_equal(arch['shape_ind'], si)

        x = forward_embeddings(ghn.params, CFG, batch, plan.shape_ind)
        x0 = x.reshape(1, batch.n_pad, -1)[0]
        arch_j = {k: jnp.asarray(v) for k, v in arch.items() if k != 'shape_ind'}
        logits_int, _ = itp.interpret_forward(ghn.params, CFG, bucket, x0, arch_j,
                                              images)
        np.testing.assert_allclose(np.asarray(logits_int), logits_ref,
                                   atol=1e-4, rtol=1e-4)


def test_interp_stream_from_dataset(dataset):
    """stream_interp_batches: sampler indices -> bucket-homogeneous meta-batches,
    consumable by the Trainer with a bounded program cache."""
    from ghn3_tpu.data.deepnets1m import NodeBudgetSampler
    from ghn3_tpu.parallel.meta_executor import stream_interp_batches
    from ghn3_tpu.parallel.trainer import Trainer

    sampler = NodeBudgetSampler(dataset, meta_batch_size=2, seed=0)
    stream = stream_interp_batches(dataset, sampler, CFG, 2, num_classes=10,
                                   is_imagenet_input=False, patience=8,
                                   vocab=dataset.interpreter_vocab())
    ghn = GHN3(CFG, seed=0)
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3},
                      n_batches=2, predparam_wd=3e-5)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    for _ in range(2):
        ib = next(stream)
        assert len(ib.batch) == 2
        m = trainer.update(images, labels, meta_batch=ib)
        assert np.isfinite(m['loss'].avg)


def test_node_budget_sampler(dataset):
    from ghn3_tpu.data.deepnets1m import NodeBudgetSampler
    sampler = NodeBudgetSampler(dataset, meta_batch_size=2, seed=0)
    it = iter(sampler)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert len(b) == 2
        assert sampler.check_batch(b)
    # sharded sampling is disjoint per shard within an epoch
    s0 = NodeBudgetSampler(dataset, meta_batch_size=2, shard=0, num_shards=2, seed=0)
    s1 = NodeBudgetSampler(dataset, meta_batch_size=2, shard=1, num_shards=2, seed=0)
    b0 = next(iter(s0))
    b1 = next(iter(s1))
    assert not (set(b0) & set(b1))


def test_writer_loader_roundtrip(tmp_path):
    """deepnets1m_writer output (published hdf5/meta layout) loads through
    DeepNets1M and decodes to graphs byte-identical to the constructive builder
    — dataset generation is self-contained, no downloads (scripts/
    generate_deepnets1m.py)."""
    import numpy as np
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.deepnets1m_writer import write_dataset
    from ghn3_tpu.nets.darts_graph import build_genotype_graph

    out = write_dataset(str(tmp_path), n_train=8, n_val=2, seed=3)
    ds = DeepNets1M(split='train', nets_dir=out, virtual_edges=50, num_nets=8,
                    debug=True)
    assert len(ds) == 8
    for i in range(len(ds)):
        g = ds[i]
        g2 = build_genotype_graph(num_classes=10, is_imagenet_input=False,
                                  ve_cutoff=50, **g.net_args)
        assert g.n_nodes == g2.n_nodes, i
        np.testing.assert_array_equal(g.node_op, g2.node_op, err_msg=str(i))
        np.testing.assert_array_equal(g.adj, g2.adj, err_msg=str(i))


def test_writer_msa_cse_pool_never_emits_flatten_heads(tmp_path):
    """With the full op pool (--ops incl. msa/cse), the writer never pairs
    msa/cse genotypes with flatten heads: the reference Network's fixed
    flattened-feature table (ops.py:497-500) does not cover msa/cse stride
    semantics, and the reference itself crashes on such nets (verified by
    running the identical net through the reference oracle)."""
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.deepnets1m_writer import write_dataset

    ops = ('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect',
           'dil_conv_3x3', 'avg_pool_3x3', 'none', 'msa', 'cse')
    out = write_dataset(str(tmp_path), n_train=24, n_val=4, seed=3, ops=ops,
                        glob_avg_p=0.5)
    ds = DeepNets1M(split='train', nets_dir=out, num_nets=24, attach_net=False)
    n_special = 0
    for i in range(len(ds)):
        na = ds[i].net_args
        geno = na['genotype']
        special = any(o in ('msa', 'cse') for o, _ in geno.normal + geno.reduce)
        n_special += special
        if special:
            assert na['glob_avg'], f'net {i}: msa/cse with flatten head'
    assert n_special >= 5, 'op pool should produce msa/cse nets in 24 draws'


def test_writer_ood_eval_splits(tmp_path):
    """The writer emits the published OOD eval splits (reference eval_ghn.py
    --split wide/deep/dense/bnfree) into the shared eval file; each decodes
    through DeepNets1M with its defining distribution shift, the predict path
    consumes the shifted nets, and adding splits to a recipe leaves train/val
    byte-identical (rng draws after train/val)."""
    import json

    import numpy as np

    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.deepnets1m_writer import write_dataset
    from ghn3_tpu.nets.darts_graph import build_genotype_graph

    base = write_dataset(str(tmp_path / 'a'), n_train=4, n_val=3, seed=11)
    full = write_dataset(str(tmp_path / 'b'), n_train=4, n_val=3, seed=11,
                         n_test=2, n_wide=2, n_deep=2, n_dense=2, n_bnfree=2,
                         n_search=2)
    ma = json.load(open(base + '/deepnets1m_meta.json'))
    mb = json.load(open(full + '/deepnets1m_meta.json'))
    assert json.dumps(ma['train']['nets']) == json.dumps(mb['train']['nets'])
    assert json.dumps(ma['val']['nets']) == json.dumps(mb['val']['nets'])

    # the NAS search split lives in its own file (published layout)
    search = DeepNets1M(split='search', nets_dir=full, attach_net=False)
    assert len(search) == 2 and search.is_train and search[0].n_nodes > 0

    for split in ('val', 'test', 'wide', 'deep', 'dense', 'bnfree'):
        ds = DeepNets1M(split=split, nets_dir=full, attach_net=False)
        for i in range(len(ds)):
            g = ds[i]
            na = g.net_args
            stored = ds.nets[i]
            if split == 'wide':
                # the loader widens stored C 4x at decode (published mechanism)
                assert na['C'] == stored['C'] * 4
            else:
                assert na['C'] == stored['C']
            if split == 'bnfree':
                assert na['norm'] in (None, '', 'none')
            else:
                assert na['norm'] == 'bn'
            if split == 'deep':
                assert na['n_cells'] in (4, 6, 8)   # 2x the (2,3,4) train pool
            if split == 'dense':
                assert len(na['genotype'].normal) >= 4   # 2x the steps pool
            # eval-split records decode to the same graph the constructive
            # builder emits for the stored args (wide rebuilds at 4x width)
            if split != 'wide':
                g2 = build_genotype_graph(num_classes=10,
                                          is_imagenet_input=False,
                                          ve_cutoff=50, **na)
                np.testing.assert_array_equal(g.node_op, g2.node_op)
                np.testing.assert_array_equal(g.adj, g2.adj)


def test_writer_norm_free_fraction(tmp_path):
    """norm_free_p mixes norm-free nets into the sampled distribution
    (positive-control experiments; RESULTS.md bnfree section). 0.0 must keep
    the default all-BN stream byte-identical (no rng draw is consumed)."""
    import json

    from ghn3_tpu.data.deepnets1m import DeepNets1M
    from ghn3_tpu.data.deepnets1m_writer import write_dataset

    base = write_dataset(str(tmp_path / 'a'), n_train=6, n_val=2, seed=3)
    same = write_dataset(str(tmp_path / 'b'), n_train=6, n_val=2, seed=3,
                         norm_free_p=0.0)
    mixed = write_dataset(str(tmp_path / 'c'), n_train=6, n_val=2, seed=3,
                          norm_free_p=0.5)
    allfree = write_dataset(str(tmp_path / 'd'), n_train=6, n_val=2, seed=3,
                            norm_free_p=1.0)
    ma = json.load(open(base + '/deepnets1m_meta.json'))
    mb = json.load(open(same + '/deepnets1m_meta.json'))
    assert json.dumps(ma) == json.dumps(mb)

    norms = [n['norm'] for n in
             json.load(open(mixed + '/deepnets1m_meta.json'))['train']['nets']]
    assert set(norms) == {'bn', None}   # 6 draws at p=0.5, seed chosen to mix
    assert all(n['norm'] is None for n in
               json.load(open(allfree + '/deepnets1m_meta.json'))['train']['nets'])

    # norm-free records decode and carry no bn nodes
    ds = DeepNets1M(split='train', nets_dir=allfree, attach_net=False)
    for i in range(len(ds)):
        assert ds[i].net_args['norm'] is None


def test_mixed_norm_interp_stream_trains(tmp_path):
    """Meta-training over a MIXED-norm dataset (norm_free_p: BN and norm-free
    nets in one stream — the RESULTS.md bnfree positive-control recipe):
    bucket-homogeneous batches keep has_norm uniform per program, both bucket
    kinds appear, and the Trainer steps each to a finite loss."""
    from ghn3_tpu.data.deepnets1m import DeepNets1M, NodeBudgetSampler
    from ghn3_tpu.data.deepnets1m_writer import write_dataset
    from ghn3_tpu.parallel.meta_executor import stream_interp_batches
    from ghn3_tpu.parallel.trainer import Trainer

    nets_dir = write_dataset(str(tmp_path), n_train=8, n_val=1, seed=5,
                             norm_free_p=0.5, cells_choices=(2,),
                             steps_choices=(1,), c_choices=(8,),
                             fc_dim_choices=(64,), c_mult_choices=(1,),
                             fc_layers_choices=(1,), glob_avg_p=1.0)
    ds = DeepNets1M(split='train', nets_dir=nets_dir, wider_nets=False, seed=0)
    norms = {n['norm'] for n in ds.nets}
    assert norms == {'bn', None}

    sampler = NodeBudgetSampler(ds, meta_batch_size=2, seed=0)
    stream = stream_interp_batches(ds, sampler, CFG, 2, num_classes=10,
                                   is_imagenet_input=False, patience=8,
                                   vocab=ds.interpreter_vocab())
    ghn = GHN3(CFG, seed=0)
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3},
                      n_batches=4, predparam_wd=3e-5)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(4,))
    seen_norm_kinds = set()
    for _ in range(4):
        ib = next(stream)
        seen_norm_kinds.add(ib.bucket.has_norm)
        m = trainer.update(images, labels, meta_batch=ib)
        assert np.isfinite(m['loss'].avg)
        if seen_norm_kinds == {True, False}:
            break
    assert seen_norm_kinds == {True, False}
