"""Shared setup for the multi-process DP test: identical model/batch in every
process and in the single-process reference run."""
import numpy as np


def build_trainer(mesh):
    import jax
    from ghn3_tpu.nets.simple import ConvNet
    from ghn3_tpu.parallel.mesh import replicated
    from ghn3_tpu.parallel.trainer import Trainer

    net = ConvNet(channels=(8, 16), num_classes=10, input_sz=32)
    params = net.init_params(jax.random.PRNGKey(0))
    # params must be global (replicated) arrays so the jitted step spans the
    # whole multi-process mesh
    params = {k: jax.device_put(np.asarray(v), replicated(mesh))
              for k, v in params.items()}
    return Trainer(model=net, model_params=params, opt='sgd',
                   opt_args={'lr': 0.1, 'momentum': 0.9}, n_batches=1,
                   label_smoothing=0.1, mesh=mesh)


def global_batch(batch=8):
    rng = np.random.default_rng(42)
    images = rng.normal(size=(batch, 3, 32, 32)).astype(np.float32)
    labels = rng.integers(0, 10, size=(batch,))
    return images, labels
