"""Randomized genotype-space fuzz: every net the full-op-pool sampler can emit
must flow through graph construction, interpreter encoding, and decode-plan
mapping with full parameter coverage.

This hardens the joint space the per-family golden tests sample pointwise:
random op choices (incl. msa/cse), random wiring, random macro-config — the
same space the reference's DeepNets-1M training stream draws from
(/root/reference/ghn3/deepnets1m.py:99-133). Host-side only (no XLA compile
per net), so hundreds of architectures fuzz in seconds.
"""
import numpy as np
import pytest

from ghn3_tpu import GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.predict import build_plan

CFG = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11),
                num_classes=10)

FULL_OPS = ('sep_conv_3x3', 'conv_3x3', 'conv_5x5', 'max_pool_3x3',
            'skip_connect', 'dil_conv_3x3', 'avg_pool_3x3', 'none',
            'msa', 'cse')


def _sample(rng, i):
    from ghn3_tpu.data.deepnets1m_writer import sample_net_args
    return sample_net_args(rng, ops=FULL_OPS,
                           steps_choices=(1, 2), cells_choices=(2, 3, 4),
                           c_choices=(8, 16, 32), fc_dim_choices=(64, 128),
                           c_mult_choices=(1, 2), fc_layers_choices=(1, 2),
                           glob_avg_p=0.7)


def test_fuzz_encode_and_plan_coverage():
    """200 random full-pool nets: graph builds, encode_arch consumes every
    parameter node exactly once (its internal coverage check), and the decode
    plan maps every param-table tensor (sanity_check of build_plan)."""
    from ghn3_tpu.data.deepnets1m import DeepNets1M  # noqa: F401 (env parity)
    from ghn3_tpu.nets.darts import Network
    from ghn3_tpu.nets.darts_graph import build_genotype_graph
    from ghn3_tpu.nets.interpreter import EncodeError, encode_arch, \
        vocab_from_genotypes

    rng = np.random.default_rng(20260818)
    n_ok = n_vit = n_unbuildable = 0
    for i in range(200):
        args = _sample(rng, i)
        try:
            g = build_genotype_graph(num_classes=10, is_imagenet_input=False,
                                     ve_cutoff=CFG.ve_cutoff, **args)
        except AssertionError:
            # degenerate sample (e.g. an all-'none' cell kills the output);
            # the dataset writer resamples these (deepnets1m_writer.py) and
            # the reference stream never stores them
            n_unbuildable += 1
            continue
        g.net_args = dict(args)
        net = Network(num_classes=10, is_imagenet_input=False, **args)
        vocab = vocab_from_genotypes([args['genotype']])

        # interpreter encoding: full param-node coverage is validated inside
        try:
            bucket, arch = encode_arch(g, num_classes=10, cfg=CFG, vocab=vocab)
        except EncodeError as e:
            # the only legitimate rejection in this sampled space is a
            # degenerate all-dead concat; anything else is a coverage bug
            assert 'dead' in str(e), (i, args, str(e))
            continue
        n_vit += bucket.is_vit
        assert arch['slot_op'].shape[0] == bucket.n_cells

        # decode-plan mapping: every tensor of the param table must be covered.
        # Plan items are GRAPH NODES; a 1-D weight item covers the norm/bias
        # weight+bias PAIR (decode_1d semantics, predict.py _assemble rows),
        # while 2-D class weights and standalone biases cover one tensor each
        plan = build_plan(GraphBatch.from_graphs([g]), [net.param_table()],
                          CFG, sanity_check=True)
        n_covered = sum((2 if len(it.target_sz) == 1 and it.record.is_w else 1)
                        for _key, items in plan.groups.items() for it in items)
        n_expected = sum(len(cell) for cell in net.param_table())
        assert n_covered == n_expected, (i, args)
        n_ok += 1

    assert n_ok >= 170, f'only {n_ok}/200 fuzz nets encoded'
    assert n_unbuildable <= 20, f'{n_unbuildable} unbuildable samples'
    assert n_vit >= 20, f'only {n_vit} ViT-classified nets — pool not exercised'
