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


def test_digits_source():
    """Real bundled dataset (sklearn digits): deterministic split, disjoint
    train/test, learnable signal (nearest-centroid beats chance by a wide
    margin) — the dataset behind the meta-learning proof (RESULTS.md)."""
    from ghn3_tpu.data.images import Digits, image_loader
    tr = Digits(train=True)
    te = Digits(train=False)
    assert tr.num_examples + te.num_examples == 1797
    assert tr.num_classes == te.num_classes == 10
    x, y = next(iter(tr.batches(32, seed=0)))
    assert x.shape == (32, 3, 32, 32) and x.dtype == np.float32
    # identical split across constructions
    te2 = Digits(train=False)
    np.testing.assert_array_equal(te.y, te2.y)
    np.testing.assert_array_equal(te.x, te2.x)
    # eval batches deterministic
    x1, y1 = next(iter(te.batches(64, train=False)))
    x2, y2 = next(iter(te.batches(64, train=False)))
    np.testing.assert_array_equal(x1, x2)
    # nearest-centroid on the raw pixels: real signal, not noise
    flat_tr = tr.x.reshape(tr.num_examples, -1)
    flat_te = te.x.reshape(te.num_examples, -1)
    cents = np.stack([flat_tr[tr.y == c].mean(0) for c in range(10)])
    pred = np.argmin(((flat_te[:, None] - cents[None]) ** 2).sum(-1), axis=1)
    acc = (pred == te.y).mean()
    assert acc > 0.7, acc
    # loader surface
    src = image_loader('digits', './data', imsize=32, split='val')
    assert src.num_examples == te.num_examples


def test_deepnets_width_pool_override(tmp_path):
    """num_ch_pool/fc_dim_pool bound the wider_nets sampling (interpreter
    bucket-cardinality lever, tools/bucket_stats.py)."""
    from ghn3_tpu.data.deepnets1m_writer import write_dataset
    from ghn3_tpu.data.deepnets1m import DeepNets1M
    write_dataset(str(tmp_path), n_train=6, n_val=2, cells_choices=(3,),
                  steps_choices=(1,), c_choices=(16,), fc_dim_choices=(128,),
                  c_mult_choices=(2,), fc_layers_choices=(1,), glob_avg_p=1.0)
    ds = DeepNets1M(split='train', nets_dir=str(tmp_path), attach_net=False,
                    num_ch_pool=[32, 64], fc_dim_pool=[128])
    seen_c, seen_fc = set(), set()
    for _ in range(30):
        g = ds[int(np.random.default_rng(_).integers(0, len(ds)))]
        seen_c.add(g.net_args['C'])
        seen_fc.add(g.net_args['fc_dim'])
    assert seen_c <= {32, 64}, seen_c
    assert seen_fc <= {128}, seen_fc
    # stored macro-config knobs round-trip through the writer
    assert all(a['n_cells'] == 3 and a['fc_layers'] == 1 and a['glob_avg']
               for a in ds.nets)


def _fixture_images(tmp_path):
    """Deterministic PIL fixture images in an ImageFolder layout."""
    from PIL import Image
    rng = np.random.default_rng(42)
    sizes = [(96, 80), (57, 91), (224, 224)]
    d = tmp_path / 'val' / 'cls'
    d.mkdir(parents=True)
    paths = []
    for i, (w, h) in enumerate(sizes):
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack([(xx * 255 / max(1, w - 1)),
                        (yy * 255 / max(1, h - 1)),
                        rng.integers(0, 256, size=(h, w))], axis=-1).astype(np.uint8)
        p = d / f'{i}.png'
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_eval_transform_matches_torch_interpolate(tmp_path):
    """Pixel parity of the eval path (resize shorter side to s/crop_pct,
    bilinear; center crop; normalize) against an independent oracle:
    torch.nn.functional.interpolate with antialias=True reproduces PIL's
    antialiased bilinear resize to ~1/255 (reference transforms_imagenet,
    ghn3/utils.py:124-142 uses torchvision's PIL-backed Resize/CenterCrop)."""
    torch = pytest.importorskip('torch')
    from PIL import Image
    from ghn3_tpu.data.images import ImageFolder, IMAGENET_MEAN, IMAGENET_STD

    _fixture_images(tmp_path)
    s = 64
    crop_pct = 0.875
    ds = ImageFolder(str(tmp_path), split='val', imsize=s, crop_pct=crop_pct)
    for j, (path, _y) in enumerate(ds.samples):
        ours = ds._load(path, None)     # normalized CHW float32

        img = Image.open(path).convert('RGB')
        t = torch.from_numpy(np.asarray(img, np.float32).transpose(2, 0, 1))[None] / 255
        w, h = img.size
        short = max(s, int(round(s / crop_pct))) if s >= 224 else s
        scale = short / min(w, h)
        tw, th = round(w * scale), round(h * scale)
        ref = torch.nn.functional.interpolate(t, size=(th, tw), mode='bilinear',
                                              antialias=True)[0].numpy()
        x0, y0 = (tw - s) // 2, (th - s) // 2
        ref = ref[:, y0:y0 + s, x0:x0 + s]
        # _load returns [0,1] pixels (normalization happens batch-level);
        # PIL's bilinear and torch's antialiased bilinear agree to ~1-2/255
        diff = np.abs(ours - ref)
        assert diff.mean() < 0.01 and np.percentile(diff, 99) < 0.05, \
            (j, diff.mean(), diff.max())


def test_train_and_eval_transforms_pinned(tmp_path):
    """Regression pins: fixed seeds give byte-stable transform outputs (so
    future accuracy numbers are comparable across refactors)."""
    from ghn3_tpu.data.images import ImageFolder
    _fixture_images(tmp_path)
    ds = ImageFolder(str(tmp_path), split='val', imsize=32,
                     aug='rand-m6-mstd0.5-inc1')
    # eval path: deterministic
    e1 = ds._load(ds.samples[0][0], None)
    e2 = ds._load(ds.samples[0][0], None)
    np.testing.assert_array_equal(e1, e2)
    # train path: deterministic given the rng seed (incl. RandAugment)
    t1 = ds._load(ds.samples[1][0], np.random.default_rng(7))
    t2 = ds._load(ds.samples[1][0], np.random.default_rng(7))
    np.testing.assert_array_equal(t1, t2)
    assert t1.shape == (3, 32, 32) and np.isfinite(t1).all()
    # distinct seeds actually augment
    t3 = ds._load(ds.samples[1][0], np.random.default_rng(8))
    assert np.abs(t1 - t3).max() > 1e-3
