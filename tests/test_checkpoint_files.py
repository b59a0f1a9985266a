"""Golden tests for the published-checkpoint FILE formats.

`GHN3.from_pretrained` must ingest the two on-disk formats the reference
distributes (reference nn.py:47-55):

  - joblib dumps of a bare state dict (the HF-hub format of the published
    GHN-3 checkpoints), config inferred purely from tensor shapes;
  - `torch.save` files carrying ``{'config': ..., 'state_dict': ...}`` (the
    reference Trainer's local checkpoint format), config read directly;
  - `torch.save` of a bare state dict (config inferred from shapes).

Each format round-trips a reference-built GHN through a real temp file and
must reproduce (a) the inferred architecture config and (b) byte-identical
hypernetwork parameters — which, by test_predict_parity.py, implies predicted
target parameters transfer too. A direct predicted-param check on one model
closes the loop here without re-running the whole zoo.
"""
import copy

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from conftest import enable_reference_import, reference_available
from torch_model_zoo import ZOO

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.checkpoint import params_from_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason='reference repo not mounted')

# heads must follow the shape-inference rule (16 if hid > 64 else 8,
# reference nn.py:93): heads is not recoverable from tensor shapes, so the
# published checkpoints all satisfy it and so must these fixtures
CFG = GHNConfig(hid=32, heads=8, layers=2, max_shape=(16, 16, 11, 11),
                num_classes=10, ve=True, weight_norm=True, layernorm=True)


@pytest.fixture(scope='module')
def ref_ghn():
    enable_reference_import()
    from ghn3.nn import GHN3 as RefGHN3
    torch.manual_seed(11)
    ref = RefGHN3(max_shape=CFG.max_shape, num_classes=CFG.num_classes,
                  hid=CFG.hid, heads=CFG.heads, layers=CFG.layers,
                  is_ghn2=False, pretrained=False, ve=True, weight_norm=True,
                  layernorm=True, debug_level=0)
    ref.eval()
    return ref


def _assert_loaded_matches(loaded: GHN3, ref):
    # config inferred from shapes (reference nn.py:59-100 semantics)
    assert loaded.config.hid == CFG.hid
    assert loaded.config.layers == CFG.layers
    assert loaded.config.num_classes == CFG.num_classes
    assert loaded.config.layernorm == CFG.layernorm
    assert loaded.config.max_shape[:2] == CFG.max_shape[:2]
    assert not loaded.config.is_ghn2

    # hypernet params byte-identical to the source state dict
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    direct = params_from_state_dict(sd, loaded.config)
    assert set(loaded.params) == set(direct)
    for k in direct:
        np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                      np.asarray(direct[k]), err_msg=k)

    # predicted-param parity against the reference on one target model
    # (the existing 1e-5 harness, test_predict_parity.py)
    torch.manual_seed(0)
    model_ref = ZOO['plain_cnn']()
    model_ours = copy.deepcopy(model_ref)
    with torch.no_grad():
        ref(model_ref, keep_grads=False, reduce_graph=False,
            bn_track_running_stats=True)
    loaded(model_ours, reduce_graph=False, bn_track_running_stats=True)
    for (k, p_ours), (_, p_ref) in zip(model_ours.named_parameters(),
                                       model_ref.named_parameters()):
        np.testing.assert_allclose(p_ours.detach().numpy(),
                                   p_ref.detach().numpy(),
                                   atol=1e-5, rtol=1e-4, err_msg=k)


def test_from_pretrained_joblib_bare_state_dict(ref_ghn, tmp_path):
    """The HF-hub distribution format: joblib.dump of a bare state dict."""
    joblib = pytest.importorskip('joblib')
    path = str(tmp_path / 'ghn_test.pt')
    joblib.dump(ref_ghn.state_dict(), path)
    _assert_loaded_matches(GHN3.from_pretrained(path), ref_ghn)


def test_from_pretrained_torch_save_with_config(ref_ghn, tmp_path):
    """The local-checkpoint format: torch.save({'config', 'state_dict'})."""
    path = str(tmp_path / 'checkpoint.pt')
    config = dict(hid=CFG.hid, heads=CFG.heads, layers=CFG.layers,
                  max_shape=CFG.max_shape, num_classes=CFG.num_classes,
                  layernorm=CFG.layernorm, weight_norm=CFG.weight_norm,
                  ve=CFG.ve)
    torch.save({'config': config, 'state_dict': ref_ghn.state_dict()}, path)
    _assert_loaded_matches(GHN3.from_pretrained(path), ref_ghn)


def test_from_pretrained_torch_save_bare_state_dict(ref_ghn, tmp_path):
    path = str(tmp_path / 'ghn_bare.pt')
    torch.save(ref_ghn.state_dict(), path)
    _assert_loaded_matches(GHN3.from_pretrained(path), ref_ghn)
