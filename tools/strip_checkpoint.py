#!/usr/bin/env python
"""Strip a trainer checkpoint to a params-only artifact for distribution.

Trainer checkpoints (``parallel/trainer.py``) carry optimizer state
(``__opt__N`` arrays — 2x the parameter bytes for AdamW) plus resume metadata;
evidence/serving artifacts only need the parameters and the config. This is
how the committed ``checkpoint_params.npz`` files are produced (e.g.
``checkpoints/ghn2_proof/checkpoint_params.npz``): ~3x smaller, still loads
through ``GHN3.from_pretrained`` (``checkpoint.py`` ignores ``__opt__``/
``opt_treedef`` keys either way; this just stops committing them).

    python tools/strip_checkpoint.py checkpoints/x/checkpoint.npz \
        [checkpoints/x/checkpoint_params.npz] [--f16]

``--f16`` additionally casts float32/float64 arrays to float16 (half the
bytes again) for large distribution artifacts; the loader casts back to
float32 on read, so re-evaluate from the stripped file when citing numbers.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def strip(src: str, dst: str, f16: bool = False) -> None:
    data = np.load(src, allow_pickle=True)
    out = {k: data[k] for k in data.files
           if k != '__meta__' and not k.startswith('__opt__')}
    if f16:
        out = {k: (v.astype(np.float16) if v.dtype in (np.float32, np.float64)
                   else v) for k, v in out.items()}
    n_params = len(out)
    if '__meta__' in data.files:
        meta = data['__meta__'].item()
        meta.pop('opt_treedef', None)
        # only re-emit __meta__ when the source had one: fabricating an empty
        # dict would push checkpoint.py's loader down the __meta__ branch and
        # default-guess a config where the original file yielded cfg=None
        out['__meta__'] = np.array(meta, dtype=object)
    elif '__config__' not in data.files:
        print(f'warning: {src} has neither __meta__ nor __config__ — the '
              'output will load with no inferable GHN config', file=sys.stderr)
    # atomic + compressed: a killed run must not truncate the canonical
    # artifact path, and committed evidence blobs should be small
    tmp = dst + '.tmp.npz'
    np.savez_compressed(tmp, **out)
    os.replace(tmp, dst)
    a, b = os.path.getsize(src), os.path.getsize(dst)
    print(f'{src} ({a / 1e6:.1f} MB) -> {dst} ({b / 1e6:.1f} MB), '
          f'{n_params} param arrays')


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:] if a != '--f16']
    f16 = '--f16' in sys.argv[1:]
    src = argv[0]
    dst = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(src),
        'checkpoint_params_f16.npz' if f16 else 'checkpoint_params.npz')
    strip(src, dst, f16=f16)
