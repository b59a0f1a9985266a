"""ViT functional twin: name compatibility + identical evaluation of predicted
parameters between the torch graph source and the JAX twin."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import jax.numpy as jnp

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.graph.torch_trace import trace_torch_model
from ghn3_tpu.predict import predict_batch
from ghn3_tpu.zoo.jax_zoo import ViTF
from ghn3_tpu.zoo.torch_zoo import vit_b_16


def test_vit_twin_predict_and_forward():
    torch.manual_seed(0)
    tm = vit_b_16(num_classes=10, dim=32, depth=2, heads=2, patch=8, img_size=32)
    fn = ViTF(num_classes=10, dim=32, depth=2, heads=2, patch=8, img_size=32)

    tnames = {n for n, _ in tm.named_parameters()}
    # the twin keys pos_embedding with the '.weight' decode-lookup suffix
    # (predict.py _candidate_names / reference nn.py:620-621)
    fnames = {n[:-len('.weight')] if n.endswith('pos_embedding.weight') else n
              for n, _, _ in fn.named_params()}
    assert tnames == fnames, sorted(tnames ^ fnames)[:8]

    cfg = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11), num_classes=10)
    ghn = GHN3(cfg, seed=3)
    # the pos_embedding class-token row is sampled (reference nn.py:445-447);
    # identical seeds make the torch and JAX paths produce identical rows
    ghn(tm, rng=np.random.default_rng(5))
    g = trace_torch_model(tm, ve_cutoff=50)
    predict_batch(ghn.params, cfg, GraphBatch.from_graphs([g]), [fn.param_table()],
                  rng=np.random.default_rng(5))

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tm.train()
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(fn(fn.predicted, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-3)
