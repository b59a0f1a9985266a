"""Image data pipeline: CIFAR-10 / ImageNet-folder / synthetic loaders.

Replaces the ppuda `image_loader` surface (SURVEY §2.9) without torchvision:
CIFAR-10 reads the binary batches directly, ImageNet walks class folders with
PIL, and the synthetic source generates deterministic batches for tests and
dry-runs. Batches are numpy NCHW float32, normalized with the standard
ImageNet/CIFAR statistics (reference transforms_imagenet, utils.py:99-142).
Augmentation: random resized crop + horizontal flip for training; resize(256) +
center-crop(224) for ImageNet eval.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
CIFAR_MEAN = np.array([0.49139968, 0.48215827, 0.44653124], dtype=np.float32)
CIFAR_STD = np.array([0.24703233, 0.24348505, 0.26158768], dtype=np.float32)


def _normalize(x: np.ndarray, mean, std) -> np.ndarray:
    return (x - mean[None, :, None, None]) / std[None, :, None, None]


class DataSource:
    num_examples: int
    num_classes: int

    def batches(self, batch_size: int, train: bool, seed: int = 0,
                shard: int = 0, num_shards: int = 1) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError


class SyntheticImages(DataSource):
    """Deterministic random images; for tests, dry runs, and throughput benches."""

    def __init__(self, num_examples=1024, num_classes=10, imsize=32):
        self.num_examples = num_examples
        self.num_classes = num_classes
        self.imsize = imsize

    def batches(self, batch_size, train=True, seed=0, shard=0, num_shards=1):
        rng = np.random.default_rng(seed + shard)
        n = self.num_examples // num_shards
        for _ in range(max(1, n // batch_size)):
            x = rng.normal(size=(batch_size, 3, self.imsize, self.imsize)).astype(np.float32)
            y = rng.integers(0, self.num_classes, size=(batch_size,))
            yield x, y


class Cifar10(DataSource):
    """CIFAR-10 from the python-format binary batches (cifar-10-batches-py)."""

    def __init__(self, data_dir: str, train: bool = True):
        root = os.path.join(data_dir, 'cifar-10-batches-py')
        if not os.path.isdir(root):
            archive = os.path.join(data_dir, 'cifar-10-python.tar.gz')
            if os.path.exists(archive):
                with tarfile.open(archive) as tf:
                    tf.extractall(data_dir)
        files = ['data_batch_%d' % i for i in range(1, 6)] if train else ['test_batch']
        xs, ys = [], []
        for fname in files:
            with open(os.path.join(root, fname), 'rb') as f:
                d = pickle.load(f, encoding='bytes')
            xs.append(d[b'data'].reshape(-1, 3, 32, 32))
            ys.append(np.array(d[b'labels']))
        self.x = (np.concatenate(xs).astype(np.float32) / 255.0)
        self.y = np.concatenate(ys).astype(np.int64)
        self.x = _normalize(self.x, CIFAR_MEAN, CIFAR_STD)
        self.train = train
        self.num_examples = len(self.x)
        self.num_classes = 10

    def batches(self, batch_size, train=None, seed=0, shard=0, num_shards=1):
        train = self.train if train is None else train
        idx = np.arange(self.num_examples)[shard::num_shards]
        rng = np.random.default_rng(seed)
        if train:
            rng.shuffle(idx)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            sel = idx[i:i + batch_size]
            x = self.x[sel]
            if train:
                # pad-4 random crop + horizontal flip
                pad = np.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4)), mode='reflect')
                out = np.empty_like(x)
                for j in range(len(sel)):
                    dy, dx = rng.integers(0, 9, size=2)
                    img = pad[j, :, dy:dy + 32, dx:dx + 32]
                    if rng.random() < 0.5:
                        img = img[:, :, ::-1]
                    out[j] = img
                x = out
            yield np.ascontiguousarray(x), self.y[sel]


class Digits(DataSource):
    """Real image data for offline environments: sklearn's bundled handwritten
    digits (1797 8x8 grayscale images, 10 classes — a genuine classification
    task, unlike `SyntheticImages`). Images are nearest-upsampled to ``imsize``
    and replicated to 3 channels so the standard CIFAR-style target networks
    (32px stems) run unchanged. Deterministic stratified 80/20 train/test split;
    train augmentation is the CIFAR pad-4 random crop (no flip — digits are not
    mirror-invariant). Used by the meta-learning proof (RESULTS.md): GHN
    meta-training needs a real dataset for "predicted params beat random init
    on held-out architectures" to be measurable."""

    # mean/std of the upsampled [0,1] train split (fixed constants so train and
    # eval normalize identically regardless of split handed out)
    MEAN = 0.3054
    STD = 0.3760

    def __init__(self, train: bool = True, imsize: int = 32, seed: int = 0):
        from sklearn.datasets import load_digits
        X, y = load_digits(return_X_y=True)
        X = X.reshape(-1, 8, 8).astype(np.float32) / 16.0
        rng = np.random.default_rng(seed)
        test_idx = []
        for c in range(10):
            cls = np.nonzero(y == c)[0]
            cls = cls[rng.permutation(len(cls))]
            test_idx.extend(cls[:max(1, len(cls) // 5)])
        mask = np.zeros(len(y), dtype=bool)
        mask[test_idx] = True
        sel = mask if not train else ~mask
        scale = max(1, imsize // 8)
        x = np.kron(X[sel], np.ones((scale, scale), np.float32))  # nearest upsample
        x = np.repeat(x[:, None], 3, axis=1)                      # grayscale -> 3ch
        self.x = ((x - self.MEAN) / self.STD).astype(np.float32)
        self.y = y[sel].astype(np.int64)
        self.imsize = 8 * scale
        self.train = train
        self.num_examples = len(self.y)
        self.num_classes = 10

    def batches(self, batch_size, train=None, seed=0, shard=0, num_shards=1):
        train = self.train if train is None else train
        idx = np.arange(self.num_examples)[shard::num_shards]
        rng = np.random.default_rng(seed)
        if train:
            rng.shuffle(idx)
        bs = min(batch_size, len(idx))
        for i in range(0, len(idx) - bs + 1, bs):
            sel = idx[i:i + bs]
            x = self.x[sel]
            if train:
                s = self.imsize
                pad = np.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4)), mode='constant')
                out = np.empty_like(x)
                for j in range(len(sel)):
                    dy, dx = rng.integers(0, 9, size=2)
                    out[j] = pad[j, :, dy:dy + s, dx:dx + s]
                x = out
            yield np.ascontiguousarray(x), self.y[sel]


class ImageFolder(DataSource):
    """ImageNet-style class-folder dataset via PIL (train/ and val/ layouts).

    Production pipeline (reference transforms_imagenet, ghn3/utils.py:99-142 +
    DataLoader workers): per-image decode/augment runs on a thread pool and
    batches are prefetched ``prefetch`` deep, so a batch-128 meta-step never
    stalls on input (tools/bench_loader.py). Optional RandAugment + eval crop
    ratio implement the "ResNet strikes back" A3 recipe (rand-m6-mstd0.5,
    crop_pct 0.95; reference train_ddp.py:26-41).
    """

    def __init__(self, data_dir: str, split: str = 'train', imsize: int = 224,
                 aug: Optional[str] = None, crop_pct: float = 0.875,
                 workers: int = 8, prefetch: int = 4):
        self.root = os.path.join(data_dir, split)
        if not os.path.isdir(self.root):
            raise FileNotFoundError(self.root)
        classes = sorted(d for d in os.listdir(self.root)
                         if os.path.isdir(os.path.join(self.root, d)))
        self.class_index = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(self.root, c)
            for fname in sorted(os.listdir(cdir)):
                self.samples.append((os.path.join(cdir, fname), self.class_index[c]))
        self.imsize = imsize
        self.train = split == 'train'
        self.num_examples = len(self.samples)
        self.num_classes = len(classes)
        self.crop_pct = crop_pct
        self.workers = max(1, workers)
        self.prefetch = max(0, prefetch)
        from .augment import make_augment
        self.rand_augment = make_augment(aug)

    def _load(self, path: str, rng: Optional[np.random.Generator]) -> np.ndarray:
        from PIL import Image
        img = Image.open(path).convert('RGB')
        s = self.imsize
        if rng is not None:  # train: random resized crop + flip [+ RandAugment]
            w, h = img.size
            for _ in range(10):
                area = w * h * rng.uniform(0.08, 1.0)
                ratio = float(np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3))))
                cw = int(round(np.sqrt(area * ratio)))
                ch = int(round(np.sqrt(area / ratio)))
                if cw <= w and ch <= h:
                    x0 = int(rng.integers(0, w - cw + 1))
                    y0 = int(rng.integers(0, h - ch + 1))
                    img = img.crop((x0, y0, x0 + cw, y0 + ch))
                    break
            img = img.resize((s, s), Image.BILINEAR)
            if rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if self.rand_augment is not None:
                img = self.rand_augment(img, rng)
        else:  # eval: resize shorter side to s/crop_pct then center crop
            w, h = img.size
            short = max(s, int(round(s / self.crop_pct))) if s >= 224 else s
            scale = short / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
            w, h = img.size
            x0, y0 = (w - s) // 2, (h - s) // 2
            img = img.crop((x0, y0, x0 + s, y0 + s))
        arr = np.asarray(img, dtype=np.float32).transpose(2, 0, 1) / 255.0
        return arr

    def _make_batch(self, sel, seeds, train, pool):
        rngs = [np.random.default_rng(sd) if train else None for sd in seeds]
        xs = list(pool.map(lambda a: self._load(self.samples[a[0]][0], a[1]),
                           zip(sel, rngs)))
        ys = np.array([self.samples[j][1] for j in sel], dtype=np.int64)
        return _normalize(np.stack(xs), IMAGENET_MEAN, IMAGENET_STD), ys

    def batches(self, batch_size, train=None, seed=0, shard=0, num_shards=1):
        from concurrent.futures import ThreadPoolExecutor
        train = self.train if train is None else train
        idx = np.arange(self.num_examples)[shard::num_shards]
        rng = np.random.default_rng(seed)
        if train:
            rng.shuffle(idx)
        starts = list(range(0, len(idx) - batch_size + 1, batch_size))
        with ThreadPoolExecutor(self.workers) as pool, \
                ThreadPoolExecutor(1 + self.prefetch) as batch_pool:
            pending = []
            for i in starts:
                sel = idx[i:i + batch_size]
                seeds = rng.integers(0, 2 ** 63, size=len(sel)) if train else \
                    [None] * len(sel)
                pending.append(batch_pool.submit(self._make_batch, sel, seeds,
                                                 train, pool))
                while len(pending) > self.prefetch:
                    yield pending.pop(0).result()
            for fut in pending:
                yield fut.result()


class NoisyImages(DataSource):
    """Additive-gaussian-noise wrapper for robustness evaluation (ppuda
    image_loader noise option, SURVEY §2.9)."""

    def __init__(self, source: DataSource, std: float = 0.08, seed: int = 0):
        self.source = source
        self.std = std
        self.seed = seed
        self.num_examples = source.num_examples
        self.num_classes = source.num_classes

    def batches(self, batch_size, train=False, seed=0, shard=0, num_shards=1):
        rng = np.random.default_rng(self.seed)
        for x, y in self.source.batches(batch_size, train=train, seed=seed,
                                        shard=shard, num_shards=num_shards):
            yield x + self.std * rng.standard_normal(x.shape).astype(np.float32), y


def image_loader(dataset: str, data_dir: str, imsize: int = 224,
                 split: str = 'train', noise: bool = False,
                 aug: Optional[str] = None, crop_pct: float = 0.875,
                 workers: int = 8) -> DataSource:
    if dataset == 'synthetic':
        src = SyntheticImages(imsize=imsize)
    elif dataset == 'digits':
        src = Digits(train=split == 'train', imsize=imsize)
    elif dataset == 'cifar10':
        src = Cifar10(data_dir, train=split == 'train')
    elif dataset == 'imagenet':
        src = ImageFolder(data_dir, split=split, imsize=imsize, aug=aug,
                          crop_pct=crop_pct, workers=workers)
    else:
        raise NotImplementedError(dataset)
    return NoisyImages(src) if noise else src
