"""Serving export: the per-architecture prediction program serializes with
jax.export and reproduces predict_packed's buffer after a deserialize
roundtrip (tools/export_ghn.py)."""
import subprocess
import sys
import os
import json

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_export_roundtrip_cli(tmp_path):
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run(
        [sys.executable, 'tools/export_ghn.py', '--arch', 'convnet',
         '--platform', 'cpu', '--hid', '32', '--layers', '2', '--heads', '2',
         '--max_shape', '16', '16', '11', '11', '--out', str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert 'roundtrip verified' in out.stdout + out.stderr

    bin_path = tmp_path / 'ghn_predict_convnet.bin'
    meta = json.loads((tmp_path / 'ghn_predict_convnet.json').read_text())
    assert meta['spec'] and meta['buffer_elems'] > 0

    # consumer-side load: no framework model code, just jax.export + the spec
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from jax import export as jexport
    exp = jexport.deserialize(bin_path.read_bytes())

    from ghn3_tpu import GHN3, GHNConfig
    cfg = GHNConfig(hid=32, heads=2, layers=2, max_shape=(16, 16, 11, 11),
                    num_classes=10, layernorm=True)
    ghn = GHN3(cfg, seed=0)   # same seed as the tool's fresh-GHN path
    buf = np.asarray(exp.call(ghn.params))
    assert buf.size == meta['buffer_elems'] and np.isfinite(buf).all()
    # spec offsets address the buffer exactly
    end = max(off + int(np.prod(sz)) for off, sz in meta['spec'].values())
    assert end <= buf.size
