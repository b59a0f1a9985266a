"""Meta-training: differentiable predict->apply step, DP sharding, NaN-skip,
checkpoint save/resume."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.parallel.mesh import data_mesh
from ghn3_tpu.parallel.trainer import Trainer, build_meta_batch

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11), num_classes=10,
                layernorm=True)


def _meta_batch(cfg):
    nets = [ConvNet(channels=(8, 16)), ConvNet(channels=(8, 8, 16))]
    graphs = [n.graph_def(ve_cutoff=cfg.ve_cutoff) for n in nets]
    return build_meta_batch(cfg, GraphBatch.from_graphs(graphs), nets)


def test_meta_training_step_decreases_loss():
    ghn = GHN3(CFG, seed=1)
    mb = _meta_batch(CFG)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(16, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(16,))

    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3, 'weight_decay': 1e-2},
                      scheduler='cosine', n_batches=10, epochs=2, predparam_wd=3e-5,
                      grad_clip=5.0)
    losses = []
    for _ in range(8):
        m = trainer.update(images, labels, meta_batch=mb)
        losses.append(m['loss'].avg)
        trainer.metrics['loss'].__init__()  # per-step loss
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_meta_training_on_mesh():
    mesh = data_mesh(8)
    ghn = GHN3(CFG, seed=1)
    mb = _meta_batch(CFG)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(16, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(16,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=4, epochs=1, mesh=mesh)
    m = trainer.update(images, labels, meta_batch=mb)
    assert np.isfinite(m['loss'].avg)


def test_classifier_training_step():
    net = ConvNet(channels=(8, 16))
    params = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(32, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(32,))
    trainer = Trainer(model=net, model_params=params, opt='sgd',
                      opt_args={'lr': 0.05, 'momentum': 0.9}, scheduler='cosine',
                      n_batches=10, epochs=1)
    losses = []
    for _ in range(10):
        m = trainer.update(images, labels)
        losses.append(m['loss'].avg)
        trainer.metrics['loss'].__init__()
    assert losses[-1] < losses[0]


def test_checkpoint_save_resume(tmp_path):
    ghn = GHN3(CFG, seed=1)
    mb = _meta_batch(CFG)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=2, epochs=2, save_dir=str(tmp_path))
    trainer.update(images, labels, meta_batch=mb)
    trainer.save(epoch=0, step=1, config={'note': 'test'}, save_freq=300)
    assert os.path.exists(trainer.checkpoint_path)
    p0 = {k: np.asarray(v) for k, v in ghn.params.items()}

    ghn2 = GHN3(CFG, seed=2)
    trainer2 = Trainer(ghn=ghn2, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                       n_batches=2, epochs=2, save_dir=str(tmp_path))
    for k in p0:
        np.testing.assert_allclose(np.asarray(ghn2.params[k]), p0[k],
                                   err_msg=f'{k} not restored')
    assert trainer2.start_epoch == 1  # step 1 == n_batches-1 -> next epoch


def test_checkpoint_epoch_freq(tmp_path):
    """epoch_freq>1 skips the epoch-end resume write on non-matching epochs
    but still writes epoch-0, matching epochs, and interm checkpoints."""
    ghn = GHN3(CFG, seed=1)
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=2, epochs=40, save_dir=str(tmp_path))
    ck = trainer.checkpoint_path

    def saved_at(epoch, **kw):
        if os.path.exists(ck):
            os.remove(ck)
        trainer.save(epoch=epoch, step=1, save_freq=300, **kw)
        return os.path.exists(ck)

    assert saved_at(0, epoch_freq=10)            # epoch 0 always saved
    assert not saved_at(3, epoch_freq=10, interm_epoch=100)
    assert saved_at(9, epoch_freq=10)            # (9+1) % 10 == 0
    assert saved_at(3, epoch_freq=1)             # default behavior unchanged
    # interm epoch still writes its own file even when the main save is skipped
    interm = ck.replace('.npz', '_epoch20.npz')
    assert not saved_at(19, epoch_freq=7, interm_epoch=20)
    assert os.path.exists(interm)


def test_nan_skip():
    ghn = GHN3(CFG, seed=1)
    mb = _meta_batch(CFG)
    images = np.full((8, 3, 8, 8), np.nan, dtype=np.float32)
    labels = np.zeros((8,), dtype=np.int64)
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=2, epochs=1)
    p0 = {k: np.asarray(v).copy() for k, v in ghn.params.items()}
    trainer.update(images, labels, meta_batch=mb)
    assert trainer.skipped_updates == 1
    for k in p0:
        np.testing.assert_array_equal(np.asarray(ghn.params[k]), p0[k])


def test_checkpoint_orbax_backend(tmp_path):
    ghn = GHN3(CFG, seed=1)
    mb = _meta_batch(CFG)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    trainer = Trainer(ghn=ghn, opt='adamw', opt_args={'lr': 1e-3}, scheduler='cosine',
                      n_batches=4, epochs=2, save_dir=str(tmp_path),
                      checkpoint_backend='orbax')
    trainer.update(images, labels, meta_batch=mb)
    trainer.save(epoch=0, step=3, config={'note': 'orbax'}, save_freq=300)
    p0 = {k: np.asarray(v) for k, v in ghn.params.items()}

    trainer2 = Trainer(ghn=GHN3(CFG, seed=2), opt='adamw', opt_args={'lr': 1e-3},
                       scheduler='cosine', n_batches=4, epochs=2,
                       save_dir=str(tmp_path), checkpoint_backend='orbax')
    for k in p0:
        np.testing.assert_allclose(np.asarray(trainer2._params()[k]), p0[k],
                                   err_msg=f'{k} not restored (orbax)')
    assert trainer2.start_epoch == 1  # step==n_batches-1 -> next epoch
