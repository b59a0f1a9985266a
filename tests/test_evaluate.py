"""End-to-end eval harness: predict_packed + suite runner + jitted infer."""
import numpy as np
import jax

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.data.images import SyntheticImages, NoisyImages, image_loader
from ghn3_tpu.evaluate import infer, predict_and_eval_suite
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.predict import predict_packed

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11), num_classes=10)


def test_predict_packed_views():
    ghn = GHN3(CFG, seed=0)
    nets = [ConvNet(channels=(8, 16)), ConvNet(channels=(8, 8))]
    graphs = [n.graph_def() for n in nets]
    views = predict_packed(ghn.params, CFG, GraphBatch.from_graphs(graphs),
                           [n.param_table() for n in nets])
    assert len(views) == 2
    for net, view in zip(nets, views):
        declared = {name for name, _, _ in net.named_params()}
        assert declared == set(view.keys())
        for name, shape, _ in net.named_params():
            assert view[name].shape == shape
    # packed view equals a host-path prediction
    from ghn3_tpu.predict import predict_batch
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs(graphs),
                  [n.param_table() for n in nets])
    for net, view in zip(nets, views):
        for name in view.keys():
            np.testing.assert_allclose(np.asarray(view[name]),
                                       np.asarray(net.predicted[name]),
                                       atol=1e-6, err_msg=name)


def test_suite_runner_and_infer():
    ghn = GHN3(CFG, seed=0)
    nets = {'a': ConvNet(channels=(8, 16)), 'b': ConvNet(channels=(8, 8, 16))}
    suite = {k: (n.graph_def(), n) for k, n in nets.items()}
    data = SyntheticImages(num_examples=64, num_classes=10, imsize=8)
    rows = predict_and_eval_suite(ghn, suite, data=data, batch_size=16, max_batches=2)
    assert len(rows) == 2
    for row in rows:
        assert np.isfinite(row['paramnorm'])
        assert 0.0 <= row['top1'] <= 100.0


def test_suite_runner_per_arch_resume():
    """on_row fires per completed architecture; skip re-predicts the chunk
    (same program shapes as the first pass) but only evaluates the remainder —
    the crash-resume contract tools/learning_proof.py relies on."""
    ghn = GHN3(CFG, seed=0)
    nets = {'a': ConvNet(channels=(8, 16)), 'b': ConvNet(channels=(8, 8, 16)),
            'c': ConvNet(channels=(8,))}
    suite = {k: (n.graph_def(), n) for k, n in nets.items()}
    data = SyntheticImages(num_examples=64, num_classes=10, imsize=8)

    seen = []
    rows = predict_and_eval_suite(ghn, suite, data=data, batch_size=16,
                                  max_batches=2, on_row=seen.append)
    assert [r['arch'] for r in seen] == [r['arch'] for r in rows]
    assert len(rows) == 3

    # resume: two archs already done -> only the third is (re-)evaluated,
    # with numerics identical to the full pass
    done = {r['arch'] for r in rows[:2]}
    resumed = predict_and_eval_suite(ghn, suite, data=data, batch_size=16,
                                     max_batches=2, skip=done)
    assert [r['arch'] for r in resumed] == [r['arch'] for r in rows[2:]]
    np.testing.assert_allclose(resumed[0]['paramnorm'], rows[2]['paramnorm'],
                               rtol=1e-6)
    assert resumed[0]['top1'] == rows[2]['top1']

    # all done -> no chunk is predicted at all
    assert predict_and_eval_suite(ghn, suite, data=data, batch_size=16,
                                  max_batches=2,
                                  skip={r['arch'] for r in rows}) == []


def test_infer_with_dict_params():
    net = ConvNet(channels=(8,))
    params = net.init_params(jax.random.PRNGKey(0))
    data = SyntheticImages(num_examples=32, num_classes=10, imsize=8)
    top1, top5 = infer(net, params, data, batch_size=16)
    assert 0.0 <= top1 <= top5 <= 100.0


def test_noisy_loader():
    src = image_loader('synthetic', './data', imsize=8, noise=True)
    assert isinstance(src, NoisyImages)
    x, y = next(iter(src.batches(8)))
    assert x.shape == (8, 3, 8, 8)


def test_return_embeddings():
    ghn = GHN3(CFG, seed=0)
    net = ConvNet(channels=(8, 16))
    _, emb = ghn(net, graphs=net.graph_def(), return_embeddings=True)
    assert emb.shape == (net.graph_def().n_nodes, CFG.hid)
    assert np.isfinite(emb).all()


def test_reduce_graph_equivalence():
    """reduce_graph only prunes matching bookkeeping; predictions are identical."""
    ghn = GHN3(CFG, seed=0)
    net_a, net_b = ConvNet(channels=(8, 16)), ConvNet(channels=(8, 16))
    g = net_a.graph_def()
    from ghn3_tpu.predict import predict_batch
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g]), [net_a.param_table()],
                  reduce_graph=False)
    predict_batch(ghn.params, CFG, GraphBatch.from_graphs([g]), [net_b.param_table()],
                  reduce_graph=True)
    for k in net_a.predicted:
        np.testing.assert_allclose(np.asarray(net_a.predicted[k]),
                                   np.asarray(net_b.predicted[k]), atol=1e-6, err_msg=k)


def test_adjust_net_pair_matches():
    """adjust_net (torch) and adjust_net_f (twin) perform the same surgery:
    adjusted twin forward == adjusted torch forward at 32px."""
    import torch
    import jax.numpy as jnp
    from ghn3_tpu.evaluate import adjust_net_f
    from ghn3_tpu.torch_interop import adjust_net, set_bn_eval_without_stats
    from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO

    torch.manual_seed(0)
    m = adjust_net(TORCH_ZOO['resnet18'](num_classes=10))
    twin = adjust_net_f(JAX_ZOO['resnet18'](num_classes=10))
    assert m.expected_input_sz == twin.expected_input_sz == 32
    P = {n: jnp.asarray(p.detach().numpy()) for n, p in m.named_parameters()}
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    m.eval()
    set_bn_eval_without_stats(m)
    with torch.no_grad():
        out_t = m(torch.from_numpy(x)).numpy()
    out_j = np.asarray(twin(P, jnp.asarray(x), training=False))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=2e-3)


def test_retry_transient():
    """Transient tunnel errors retry (up to 3 attempts); real errors raise
    immediately. Protects long eval sweeps on remote-attached TPUs."""
    import pytest
    from ghn3_tpu.evaluate import _retry_transient

    calls = {'n': 0}

    def flaky():
        calls['n'] += 1
        if calls['n'] < 3:
            raise RuntimeError('INTERNAL: http://host/remote_compile: '
                               'response body closed before all bytes were read')
        return 'ok'

    assert _retry_transient(flaky, wait_sec=0.0) == 'ok'
    assert calls['n'] == 3

    def hard():
        calls['n'] += 1
        raise ValueError('shape mismatch')

    calls['n'] = 0
    with pytest.raises(ValueError):
        _retry_transient(hard, wait_sec=0.0)
    assert calls['n'] == 1  # non-transient: no retry

    def always_transient():
        raise RuntimeError('UNAVAILABLE: Socket closed')

    with pytest.raises(RuntimeError):
        _retry_transient(always_transient, attempts=2, wait_sec=0.0)
