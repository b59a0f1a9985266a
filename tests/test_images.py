"""Image pipeline: CIFAR-10 binary reader and ImageFolder with generated fixtures."""
import os
import pickle

import numpy as np
import pytest

from ghn3_tpu.data.images import Cifar10, ImageFolder


@pytest.fixture()
def cifar_dir(tmp_path):
    root = tmp_path / 'cifar-10-batches-py'
    root.mkdir()
    rng = np.random.default_rng(0)
    for name, n in [('data_batch_%d' % i, 20) for i in range(1, 6)] + [('test_batch', 20)]:
        payload = {b'data': rng.integers(0, 256, size=(n, 3072), dtype=np.uint8).astype(np.uint8),
                   b'labels': rng.integers(0, 10, size=(n,)).tolist()}
        with open(root / name, 'wb') as f:
            pickle.dump(payload, f)
    return str(tmp_path)


def test_cifar_loader(cifar_dir):
    train = Cifar10(cifar_dir, train=True)
    assert train.num_examples == 100
    x, y = next(iter(train.batches(16, seed=0)))
    assert x.shape == (16, 3, 32, 32) and x.dtype == np.float32
    assert y.shape == (16,)
    # augmentation is stochastic but normalized stats stay reasonable
    assert abs(float(x.mean())) < 2.0

    test = Cifar10(cifar_dir, train=False)
    x1, y1 = next(iter(test.batches(16)))
    x2, y2 = next(iter(test.batches(16)))
    np.testing.assert_array_equal(x1, x2)  # eval path is deterministic


def test_image_folder(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for split in ('train', 'val'):
        for cls in ('cat', 'dog'):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                arr = rng.integers(0, 256, size=(40, 52, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f'{i}.jpeg')
    ds = ImageFolder(str(tmp_path), split='val', imsize=32)
    assert ds.num_examples == 6 and ds.num_classes == 2
    x, y = next(iter(ds.batches(4, train=False)))
    assert x.shape == (4, 3, 32, 32)
    assert set(np.unique(y)) <= {0, 1}
    train = ImageFolder(str(tmp_path), split='train', imsize=32)
    x, y = next(iter(train.batches(4, train=True)))
    assert x.shape == (4, 3, 32, 32)
