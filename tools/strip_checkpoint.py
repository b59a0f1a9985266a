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
        [checkpoints/x/checkpoint_params.npz]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def strip(src: str, dst: str) -> None:
    data = np.load(src, allow_pickle=True)
    meta = data['__meta__'].item() if '__meta__' in data else {}
    meta.pop('opt_treedef', None)
    out = {k: data[k] for k in data.files
           if k != '__meta__' and not k.startswith('__opt__')}
    out['__meta__'] = np.array(meta, dtype=object)
    np.savez(dst, **out)
    a, b = os.path.getsize(src), os.path.getsize(dst)
    print(f'{src} ({a / 1e6:.1f} MB) -> {dst} ({b / 1e6:.1f} MB), '
          f'{len(out) - 1} param arrays')


if __name__ == '__main__':
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(src), 'checkpoint_params.npz')
    strip(src, dst)
