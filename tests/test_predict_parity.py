"""Golden numerical parity: predicted parameters from our JAX GHN-3 must match the
reference torch implementation bit-for-bit-ish (fp32 atol 1e-5) when both use the
same hypernetwork weights. This is the de-facto checkpoint-compatibility test:
if this holds for random GHN weights, published checkpoints transfer too."""
import copy

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from conftest import enable_reference_import, reference_available
from torch_model_zoo import ZOO

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.checkpoint import params_from_state_dict

pytestmark = pytest.mark.skipif(not reference_available(), reason='reference repo not mounted')

CFG = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11), num_classes=10,
                ve=True, weight_norm=True, layernorm=True)


@pytest.fixture(scope='module')
def pair():
    """(reference torch GHN3, our JAX GHN3) sharing identical weights."""
    enable_reference_import()
    from ghn3.nn import GHN3 as RefGHN3
    torch.manual_seed(7)
    ref = RefGHN3(max_shape=CFG.max_shape, num_classes=CFG.num_classes, hid=CFG.hid,
                  heads=CFG.heads, layers=CFG.layers, is_ghn2=False, pretrained=False,
                  ve=True, weight_norm=True, layernorm=True, debug_level=0)
    ref.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    ours = GHN3(CFG, params=params_from_state_dict(sd, CFG))
    return ref, ours


def _params(model):
    return {k: v.detach().cpu().numpy().copy() for k, v in model.named_parameters()}


@pytest.mark.parametrize('name', sorted(ZOO))
def test_predicted_params_match(pair, name):
    ref_ghn, our_ghn = pair
    torch.manual_seed(0)
    model_ref = ZOO[name]()
    model_ours = copy.deepcopy(model_ref)

    with torch.no_grad():
        ref_ghn(model_ref, keep_grads=False, reduce_graph=False, bn_track_running_stats=True)
    our_ghn(model_ours, reduce_graph=False, bn_track_running_stats=True)

    p_ref, p_ours = _params(model_ref), _params(model_ours)
    assert set(p_ref) == set(p_ours)
    for k in p_ref:
        ours, ref = p_ours[k], p_ref[k]
        if k.endswith('pos_embedding'):
            # the class-token row is SAMPLED (reference nn.py:445-447:
            # torch.normal(0, 0.02)); torch and numpy rngs cannot agree, so
            # compare the predicted rows exactly and the random row by moments
            assert abs(float(ours[:, 0].std()) - 0.02) < 0.02, k
            ours, ref = ours[:, 1:], ref[:, 1:]
        np.testing.assert_allclose(
            ours, ref, atol=1e-5, rtol=1e-4,
            err_msg=f'{name}: predicted parameter {k} differs from reference')


def test_batched_equals_individual(pair):
    """Our batched prediction must equal per-model prediction (the reference
    deviates here for unequal graph sizes — see GraphBatch docstring)."""
    _, our_ghn = pair
    torch.manual_seed(0)
    small = ZOO['plain_cnn']()
    big = ZOO['mini_resnet']()
    small_b, big_b = copy.deepcopy(small), copy.deepcopy(big)

    our_ghn([small_b, big_b])
    our_ghn(small)
    our_ghn(big)

    for a, b in ((small, small_b), (big, big_b)):
        for (k, pa), (_, pb) in zip(a.named_parameters(), b.named_parameters()):
            np.testing.assert_allclose(pa.detach().numpy(), pb.detach().numpy(), atol=1e-5,
                                       err_msg=f'batched != individual for {k}')


def test_predict_class_layers_false(pair):
    """Fine-tuning mode: classification weight/bias stay untouched (reference
    nn.py:301-302)."""
    ref_ghn, our_ghn = pair
    torch.manual_seed(0)
    model_ref = ZOO['plain_cnn']()
    model_ours = copy.deepcopy(model_ref)
    before = {k: v.detach().numpy().copy() for k, v in model_ours.named_parameters()}

    with torch.no_grad():
        ref_ghn(model_ref, keep_grads=False, reduce_graph=False,
                predict_class_layers=False)
    our_ghn(model_ours, predict_class_layers=False)

    p_ref = _params(model_ref)
    p_ours = _params(model_ours)
    for k in p_ref:
        np.testing.assert_allclose(p_ours[k], p_ref[k], atol=1e-5, rtol=1e-4,
                                   err_msg=k)
    # the classifier tensors were not predicted
    np.testing.assert_array_equal(p_ours['fc.weight'], before['fc.weight'])
    np.testing.assert_array_equal(p_ours['fc.bias'], before['fc.bias'])
