"""RandAugment for the ImageNet training pipeline.

The reference enables timm's ``rand-m6-mstd0.5-inc1`` + 0.95 eval crop for the
"ResNet strikes back" A3 recipe (reference ghn3/utils.py:99-142, recipe at
train_ddp.py:26-41). This is a dependency-free PIL implementation of the same
policy: 2 ops per image, magnitude 6/10 with gaussian magnitude noise (std 0.5),
the standard 15-op set with increasing-severity mappings.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_MAX_LEVEL = 10.0


def _enhance(img, kind, factor):
    from PIL import ImageEnhance
    return {'color': ImageEnhance.Color, 'contrast': ImageEnhance.Contrast,
            'brightness': ImageEnhance.Brightness,
            'sharpness': ImageEnhance.Sharpness}[kind](img).enhance(factor)


def _affine(img, matrix):
    from PIL import Image
    return img.transform(img.size, Image.AFFINE, matrix, resample=Image.BILINEAR)


def _op_list():
    from PIL import Image, ImageOps

    def enh(kind):
        # 'inc1' mapping: factor 1 +- 0.9*level/MAX (severity grows with level)
        def apply(img, level, sign):
            return _enhance(img, kind, 1.0 + sign * 0.9 * level / _MAX_LEVEL)
        return apply

    def shear(axis):
        def apply(img, level, sign):
            v = sign * 0.3 * level / _MAX_LEVEL
            m = (1, v, 0, 0, 1, 0) if axis == 'x' else (1, 0, 0, v, 1, 0)
            return _affine(img, m)
        return apply

    def translate(axis):
        def apply(img, level, sign):
            frac = sign * 0.45 * level / _MAX_LEVEL
            v = frac * (img.size[0] if axis == 'x' else img.size[1])
            m = (1, 0, v, 0, 1, 0) if axis == 'x' else (1, 0, 0, 0, 1, v)
            return _affine(img, m)
        return apply

    return [
        ('auto_contrast', lambda img, level, sign: ImageOps.autocontrast(img)),
        ('equalize', lambda img, level, sign: ImageOps.equalize(img)),
        ('invert', lambda img, level, sign: ImageOps.invert(img)),
        ('rotate', lambda img, level, sign: img.rotate(sign * 30.0 * level / _MAX_LEVEL,
                                                       resample=Image.BILINEAR)),
        ('posterize', lambda img, level, sign: ImageOps.posterize(
            img, max(1, 4 - int(4 * level / _MAX_LEVEL)))),
        ('solarize', lambda img, level, sign: ImageOps.solarize(
            img, int(256 - 256 * level / _MAX_LEVEL))),
        ('solarize_add', lambda img, level, sign: _solarize_add(
            img, int(110 * level / _MAX_LEVEL))),
        ('color', enh('color')),
        ('contrast', enh('contrast')),
        ('brightness', enh('brightness')),
        ('sharpness', enh('sharpness')),
        ('shear_x', shear('x')),
        ('shear_y', shear('y')),
        ('translate_x', translate('x')),
        ('translate_y', translate('y')),
    ]


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int64)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    from PIL import Image
    return Image.fromarray(arr.astype(np.uint8))


class RandAugment:
    """rand-m{magnitude}-mstd{std}: ``num_ops`` random ops per image."""

    def __init__(self, magnitude: float = 6.0, num_ops: int = 2,
                 magnitude_std: float = 0.5):
        self.magnitude = magnitude
        self.num_ops = num_ops
        self.magnitude_std = magnitude_std
        self._ops = None

    def __call__(self, img, rng: np.random.Generator):
        if self._ops is None:
            self._ops = _op_list()
        for _ in range(self.num_ops):
            name, op = self._ops[int(rng.integers(len(self._ops)))]
            level = self.magnitude
            if self.magnitude_std > 0:
                level = float(rng.normal(level, self.magnitude_std))
            level = float(np.clip(level, 0, _MAX_LEVEL))
            sign = 1.0 if rng.random() < 0.5 else -1.0
            img = op(img, level, sign)
        return img


def make_augment(spec: Optional[str]) -> Optional[RandAugment]:
    """'rand-m6-mstd0.5' style spec -> RandAugment (None/'' -> no aug)."""
    if not spec:
        return None
    parts = spec.split('-')
    assert parts[0] == 'rand', spec
    mag, mstd, n = 6.0, 0.5, 2
    for p in parts[1:]:
        if p.startswith('mstd'):
            mstd = float(p[4:])
        elif p.startswith('m'):
            mag = float(p[1:])
        elif p.startswith('n'):
            n = int(p[1:])
    return RandAugment(magnitude=mag, num_ops=n, magnitude_std=mstd)
