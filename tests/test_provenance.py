"""Shape-encoder vocabulary invariants implied by the published checkpoints
(docs/PROVENANCE.md): the reference detects CIFAR GHNs by embed_spatial having
exactly 9 rows (/root/reference/ghn3/nn.py:83-84), and config inference reads
decoder/table shapes that our vocabularies must reproduce. These tests fail if
the vocab construction drifts from the checkpoint-implied sizes."""
import numpy as np
import pytest

from ghn3_tpu.config import GHNConfig
from ghn3_tpu.models.shape_encoder import tables_for


def test_embed_spatial_rows_match_checkpoint_detection():
    cifar = tables_for(GHNConfig(max_shape=(64, 64, 11, 11), num_classes=10))
    imnet = tables_for(GHNConfig(max_shape=(64, 64, 16, 16), num_classes=1000))
    # reference nn.py:84: s = 11 if len(embed_spatial) == 9 else 16
    assert cifar.n_spatial + 1 == 9
    assert imnet.n_spatial + 1 != 9
    assert imnet.n_spatial + 1 == 11   # {1,3,5,7,9,11,13,14,15,16} + dummy


def test_channel_vocab_size_stable():
    # ch_steps (8, 64, 4096, 8192): 7 + 252 + 129 grid points + {1, 3, nc}
    cifar = tables_for(GHNConfig(max_shape=(64, 64, 11, 11), num_classes=10))
    imnet = tables_for(GHNConfig(max_shape=(64, 64, 16, 16), num_classes=1000))
    assert cifar.n_channels == len(np.unique(
        [1, 3, 10] + list(range(8, 64, 8)) + list(range(64, 4096, 16))
        + list(range(4096, 8193, 32))))
    assert imnet.n_channels == cifar.n_channels - 1 + 1  # 1000 off-grid like 10
    assert cifar.n_channels == 391


def test_shim_tables_agree_with_framework():
    """The test-oracle ppuda shim's ShapeEncoder must agree with the framework's
    ShapeTables on sizes AND on every lookup in the practical range — they are
    separate implementations of the same inferred spec, so agreement catches
    one-sided editing mistakes (full external validation needs published
    checkpoints, tests/test_published_ckpt.py)."""
    torch = pytest.importorskip('torch')
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'ref_shims'))
    from ppuda.ghn.nn import ShapeEncoder

    for num_classes, s in ((10, 11), (1000, 16)):
        ours = tables_for(GHNConfig(max_shape=(64, 64, s, s), num_classes=num_classes))
        shim = ShapeEncoder(hid=32, num_classes=num_classes, max_shape=(64, 64, s, s))
        assert shim.embed_spatial.weight.shape[0] == ours.n_spatial + 1
        assert shim.embed_channel.weight.shape[0] == ours.n_channels + 1
        np.testing.assert_array_equal(np.asarray(shim.channels), ours.channels)
        np.testing.assert_array_equal(np.asarray(shim.spatial), ours.spatial)
        for c in list(range(1, 256)) + [1000, 4096, 8000]:
            assert shim.channels_lookup[c] == ours.channel_index(c), c
        for sp in range(1, int(ours.spatial[-1])):
            assert shim.spatial_lookup[sp] == ours.spatial_index(sp), sp
