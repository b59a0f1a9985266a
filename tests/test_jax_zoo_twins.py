"""Functional JAX twins vs their torch zoo counterparts: identical parameter
names and numerically equal forward passes when sharing weights. This is what
makes TPU-side eval of predicted parameters trustworthy (the reference evaluates
on torch; we predict once and evaluate as jitted programs, SURVEY §3.4)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from ghn3_tpu.torch_interop import set_bn_eval_without_stats
from ghn3_tpu.zoo.jax_zoo import JAX_ZOO
from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO

# small-config kwargs per family (full-size forwards are too slow for CI)
SMALL = {
    'alexnet': dict(w=0.25),
    'vgg11': dict(w=0.125),
    'vgg16_bn': dict(),
    'mobilenet_v2': dict(width_mult=0.25),
    'squeezenet1_1': dict(),
    'densenet121': dict(growth=8),
    'efficientnet_b0ish': dict(),
    'convnext_tiny_ish': dict(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1)),
    'inception_v3ish': dict(c=8),
    'googlenet': dict(w=0.25),
    'mnasnet1_0': dict(w=0.25),
    'shufflenet_v2_x1_0': dict(w=0.25),
    'regnet_y_400mf': dict(w=0.5),
    'regnet_x_800mf': dict(w=0.25),
    'inception_v3': dict(w=0.25),
    'mobilenet_v3_large': dict(w=0.5),
    'squeezenet1_0': dict(),
    'efficientnet_b0': dict(w=0.5),
    'efficientnet_v2_s': dict(w=0.25),
    'convnext_tiny': dict(),
    'efficientnet_v2_s_ish': dict(w=0.25),
    'swin_t': dict(embed_dim=16, depths=(2, 2), heads=(2, 2), window=4,
                   input_sz=128),
    'resnext50_32x4d': dict(),
    'vgg19_bn': dict(),
    'vgg13': dict(w=0.25),
    'densenet201': dict(growth=8),
    'shufflenet_v2_x0_5': dict(w=0.5),
    'mnasnet0_5': dict(),
    'mobilenet_v3_small': dict(w=0.5),
}


def _input_size(name):
    if name == 'swin_t':
        return 128
    if name == 'inception_v3':
        return 128
    return 96 if name == 'inception_v3ish' else 64


@pytest.mark.parametrize('name', sorted(SMALL))
def test_twin_matches_torch(name):
    torch.manual_seed(0)
    kwargs = dict(SMALL[name], num_classes=10)
    m = TORCH_ZOO[name](**kwargs)
    twin = JAX_ZOO[name](**kwargs)

    t_names = {n for n, _ in m.named_parameters()}
    j_names = {n for n, _, _ in twin.named_params()}
    assert t_names == j_names, (sorted(t_names - j_names)[:5],
                                sorted(j_names - t_names)[:5])

    P = {n: jnp.asarray(p.detach().numpy()) for n, p in m.named_parameters()}
    sz = _input_size(name)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, sz, sz)).astype(np.float32)

    m.eval()
    set_bn_eval_without_stats(m)
    with torch.no_grad():
        out_t = m(torch.from_numpy(x))
    if isinstance(out_t, tuple):
        out_t = out_t[0]
    out_j = twin(P, jnp.asarray(x), training=False)
    if isinstance(out_j, tuple):
        out_j = out_j[0]
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               atol=2e-4, rtol=2e-3,
                               err_msg=f'{name}: twin forward differs from torch')
