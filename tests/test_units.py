"""Unit tests: checkpoints, schedules, batching, metadata, shape encoder."""
import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.checkpoint import infer_config, params_from_state_dict, state_dict_from_params
from ghn3_tpu.graph.graphdef import GraphBatch, GraphDef, balanced_partition, bucket_size
from ghn3_tpu.metadata import get_metadata
from ghn3_tpu.models.shape_encoder import ShapeTables
from ghn3_tpu.parallel import optim

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11), num_classes=10)


def test_checkpoint_roundtrip(tmp_path):
    ghn = GHN3(CFG, seed=0)
    path = str(tmp_path / 'ghn.npz')
    ghn.save(path)
    ghn2 = GHN3.from_pretrained(path)
    assert ghn2.config.hid == CFG.hid and ghn2.config.layers == CFG.layers
    for k, v in ghn.params.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ghn2.params[k]))


def test_config_inference_from_state_dict():
    ghn = GHN3(GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11),
                         num_classes=10, layernorm=True), seed=0)
    sd = state_dict_from_params(ghn.params)
    cfg = infer_config(sd)
    assert cfg.hid == 32
    assert cfg.layers == 2
    assert cfg.num_classes == 10
    assert cfg.max_shape == (16, 16, 11, 11)
    assert cfg.layernorm


def test_lr_schedules():
    # cosine-warmup: linear warmup then half cosine (reference trainer.py:178-198)
    lrs = [optim.lr_multiplier('cosine-warmup', e, epochs=20, base_lr=1.0) for e in range(20)]
    assert lrs[0] == pytest.approx(1e-5)
    assert max(lrs) == pytest.approx(1.0)
    assert lrs[-1] < 0.05
    assert optim.lr_multiplier('cosine-warmupsteps2-init_lr0.1-', 0, 10, base_lr=1.0) == \
        pytest.approx(0.1)
    assert optim.lr_multiplier('mstep', 250, 300, {'milestones': [200, 250], 'gamma': 0.1}) == \
        pytest.approx(0.01)
    assert optim.lr_multiplier('step', 60, 90, {'step_size': 30, 'gamma': 0.1}) == \
        pytest.approx(0.01)


def test_bucketing_and_partition():
    assert bucket_size(10) == 16
    assert bucket_size(129) == 192
    assert bucket_size(5000) == 5120
    shards = balanced_partition([100, 90, 10, 5, 50, 45], num_shards=2, per_shard=3)
    assert sorted(len(s) for s in shards) == [3, 3]
    loads = [sum([100, 90, 10, 5, 50, 45][i] for i in s) for s in shards]
    assert abs(loads[0] - loads[1]) <= 20


def test_graph_batch_padding():
    g1 = GraphDef(node_op=np.array([9, 4, 10]), adj=np.triu(np.ones((3, 3), np.int32), 1),
                  node_info=[[]], param_shapes=[None] * 3)
    g2 = GraphDef(node_op=np.array([9, 4]), adj=np.triu(np.ones((2, 2), np.int32), 1),
                  node_info=[[]], param_shapes=[None] * 2)
    batch = GraphBatch.from_graphs([g1, g2])
    assert batch.n_pad == 16
    assert batch.mask.sum() == 5
    np.testing.assert_array_equal(batch.n_nodes, [3, 2])
    assert batch.slab_offset(1) == 16


def test_metadata_aggregates():
    meta = get_metadata('ghn3xlm16.pt')
    assert len(meta) == 74
    accs = [row['ghn3'] for row in meta.values()]
    assert np.mean(accs) == pytest.approx(1.66, abs=0.05)  # BASELINE.md headline
    assert max(accs) == pytest.approx(22.64, abs=0.01)


def test_shape_tables_vocab():
    t = ShapeTables(num_classes=10, max_spatial=11)
    assert t.n_spatial == 8  # -> 9-row embedding, the CIFAR GHN signature (nn.py:83-84)
    t16 = ShapeTables(num_classes=1000, max_spatial=16)
    assert t16.n_spatial == 10
    assert 1000 in t16.channels
    # nearest-neighbor fill
    assert t.channel_index(5) == t.channel_index(8)
    assert t.spatial_index(2) == t.spatial_index(3)
    assert t.shape_index(None) == t.dummy_index


def test_ghn2_experimental_construction():
    # GHN-2 configs construct (experimental GatedGNN path); forward is covered
    # by test_ghn2.py
    ghn = GHN3(GHNConfig(hid=16, heads=2, layers=1, is_ghn2=True,
                         max_shape=(16, 16, 11, 11)))
    assert ghn.config.is_ghn2


def test_graph_visualize_smoke(tmp_path):
    # reference graph.py:983 visualize parity surface: renders the DAG colored
    # by primitive and saves to disk
    import torch
    from ghn3_tpu.graph.torch_trace import trace_torch_model
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
    torch.manual_seed(0)
    m = TORCH_ZOO['resnet18'](num_classes=10)
    m.expected_input_sz = 32
    g = trace_torch_model(m)
    out = tmp_path / 'graph.png'
    g.visualize(figname=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_tile_params_flat_equals_tile_params():
    # the device-layout-friendly tiler must match tile_params element-for-element
    import jax.numpy as jnp
    from ghn3_tpu.ops.assembly import tile_params, tile_params_flat
    rng = np.random.default_rng(0)
    cases = [
        ((8, 8, 11, 11), (16, 24, 3, 3)),    # channel tiling both axes
        ((8, 8, 11, 11), (4, 6, 3, 3)),      # cropping both axes
        ((8, 8, 11, 11), (20, 8, 1, 1)),     # 1x1 kernel, cout tiling
        ((8, 8, 11, 11), (8, 8, 11, 11)),    # identity
        ((8, 8, 11, 11), (12, 20, 1, 7)),    # asymmetric kernel (inception)
        ((8, 8, 11, 11), (12, 20, 5, 5)),
        ((4, 4, 16, 16), (10, 3, 7, 1)),
    ]
    for s, t in cases:
        w = rng.normal(size=s).astype(np.float32)
        for corner in (False, True):
            ref = tile_params(w, t, corner=corner)
            flat = np.asarray(tile_params_flat(jnp.asarray(w), t, corner=corner))
            np.testing.assert_array_equal(flat.reshape(-1), np.asarray(ref).reshape(-1),
                                          err_msg=f'{s}->{t} corner={corner}')


def test_graph_cache_invalidates_on_code_change(tmp_path, monkeypatch):
    """Stale-cache regression (round 3): cached ViT graphs from before a zoo
    structure change served old param names -> zero decode-plan matches. The
    cache key must include a fingerprint of the graph-producing sources."""
    from ghn3_tpu.graph import cache as gc

    import types
    calls = []

    def build():
        calls.append(1)
        return types.SimpleNamespace(net=None)   # pickleable GraphDef stand-in

    d = str(tmp_path)
    gc.cached_graph('m', build, cache_dir=d)
    gc.cached_graph('m', build, cache_dir=d)
    assert len(calls) == 1                      # second call hits the cache

    p1 = gc.cache_path('m', cache_dir=d)
    monkeypatch.setattr(gc, '_code_fingerprint', lambda: 'deadbeef0000')
    p2 = gc.cache_path('m', cache_dir=d)
    assert p1 != p2                             # code change -> new key
    gc.cached_graph('m', build, cache_dir=d)
    assert len(calls) == 2                      # rebuilt, not served stale
