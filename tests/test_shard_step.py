"""Explicit shard_map+psum DP step: must match the single-device step exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.parallel.mesh import data_mesh
from ghn3_tpu.parallel.shard_step import make_sharded_train_step, shard_arrays
from ghn3_tpu.parallel.trainer import cross_entropy


def _setup():
    """BN-free model: per-shard batch statistics would otherwise (correctly,
    DDP-style) differ from a global-batch run."""
    from ghn3_tpu.nets.functional import Conv2d, FModule, Linear

    class TinyNet(FModule):
        def __init__(self):
            super().__init__()
            self.conv = Conv2d(3, 8, 3, padding=1)
            self.fc = Linear(8, 10)

        def __call__(self, P, x, prefix='', training=False):
            x = jax.nn.relu(self.conv(P, x, 'conv.', training))
            return self.fc(P, x.mean(axis=(2, 3)), 'fc.', training)

    net = TinyNet()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {'conv.weight': 0.1 * jax.random.normal(k1, (8, 3, 3, 3)),
              'conv.bias': jnp.zeros((8,)),
              'fc.weight': 0.1 * jax.random.normal(k2, (10, 8)),
              'fc.bias': jnp.zeros((10,))}
    rng = np.random.default_rng(0)
    images = rng.normal(size=(16, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(16,))

    def loss_fn(p, x, y):
        return cross_entropy(net(p, x, training=True), y)

    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-3))
    return net, params, opt, loss_fn, images, labels


def test_sharded_step_matches_single_device():
    net, params, opt, loss_fn, images, labels = _setup()
    mesh = data_mesh(8)

    # reference: plain single-device step on the full batch
    def ref_step(p, s, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p_ref, _, loss_ref = jax.jit(ref_step)(params, opt.init(params),
                                           jnp.asarray(images), jnp.asarray(labels))

    step = make_sharded_train_step(loss_fn, opt, mesh)
    x_sh, y_sh = shard_arrays(mesh, jnp.asarray(images), jnp.asarray(labels))
    p_new, _, loss = step(params, opt.init(params), x_sh, y_sh)

    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_new[k]), np.asarray(p_ref[k]),
                                   atol=1e-5, err_msg=k)


def test_sharded_nan_skip():
    net, params, opt, loss_fn, images, labels = _setup()
    mesh = data_mesh(8)
    step = make_sharded_train_step(loss_fn, opt, mesh)
    bad = np.full_like(images, np.nan)
    x_sh, y_sh = shard_arrays(mesh, jnp.asarray(bad), jnp.asarray(labels))
    p0 = {k: np.asarray(v).copy() for k, v in params.items()}
    p_new, _, loss = step(params, opt.init(params), x_sh, y_sh)
    assert not np.isfinite(float(loss))
    for k in p0:
        np.testing.assert_array_equal(np.asarray(p_new[k]), p0[k])
