"""Decoder tensor parallelism: sharded params produce identical predictions and
train with a 2-d (data x model) mesh."""
import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.parallel.tp import shard_ghn_params
from ghn3_tpu.predict import predict_packed

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11), num_classes=10)


def _mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, axis_names=('data', 'model'))


def test_tp_sharded_prediction_matches_replicated():
    ghn = GHN3(CFG, seed=0)
    net = ConvNet(channels=(8, 16))
    graphs = GraphBatch.from_graphs([net.graph_def()])

    views_rep = predict_packed(ghn.params, CFG, graphs, [net.param_table()])
    ref = {k: np.asarray(v) for k, v in views_rep[0].items()}

    mesh = _mesh2d()
    sharded = shard_ghn_params(ghn.params, mesh)
    assert any(len(sharded[k].sharding.spec) > 0 for k in
               ('decoder.fc.0.weight',)), 'decoder not sharded'
    views_tp = predict_packed(sharded, CFG, graphs, [net.param_table()])
    for k in ref:
        np.testing.assert_allclose(np.asarray(views_tp[0][k]), ref[k], atol=1e-5,
                                   err_msg=k)


def test_tp_training_step():
    from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch
    mesh = _mesh2d()
    ghn = GHN3(CFG, seed=0)
    ghn.params = shard_ghn_params(ghn.params, mesh)
    nets = [ConvNet(channels=(8, 16))]
    mb = build_meta_batch(CFG, GraphBatch.from_graphs([n.graph_def() for n in nets]), nets)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=2, epochs=1, mesh=mesh)
    m = trainer.update(images, labels, meta_batch=mb)
    assert np.isfinite(m['loss'].avg)
    # decoder stays sharded through the update
    spec = ghn.params['decoder.fc.0.weight'].sharding.spec
    assert 'model' in str(spec)
