"""GHNConfig.unit_var_norm (off-protocol He-scale rescue for norm-free nets).

With the flag on, every >1-D predicted tensor must land at exactly-He
magnitude: RMS == sqrt(beta / fan_in) with beta per the reference rule
(nn.py:566-583). With the flag off (the default), predictions must be
bit-identical to before the flag existed — the golden parity tests guard the
default path; here we assert flag-off == plain config output.
"""
import dataclasses
import math

import numpy as np

from ghn3_tpu import GHN3, GHNConfig
from ghn3_tpu.graph.graphdef import GraphBatch
from ghn3_tpu.nets.simple import ConvNet
from ghn3_tpu.predict import predict_packed

CFG = GHNConfig(hid=16, heads=2, layers=1, max_shape=(16, 16, 11, 11),
                num_classes=10)


def _views(cfg):
    ghn = GHN3(cfg, seed=0)
    nets = [ConvNet(channels=(8, 16))]
    graphs = [n.graph_def() for n in nets]
    return nets[0], predict_packed(ghn.params, cfg, GraphBatch.from_graphs(graphs),
                                   [n.param_table() for n in nets])[0]


def test_unit_var_norm_he_scale():
    cfg = dataclasses.replace(CFG, unit_var_norm=True)
    net, view = _views(cfg)
    checked = 0
    for name, shape, _ in net.named_params():
        if len(shape) <= 1:
            continue
        p = np.asarray(view[name])
        sz = p.shape
        if len(sz) > 2 and sz[2] >= 11 and sz[0] == 1:
            continue  # positional encodings are exempt
        no_relu = len(sz) > 2 and (sz[1] == 1 or sz[2] < sz[3])
        beta = 1.0 if no_relu else 2.0
        want = math.sqrt(beta / int(np.prod(sz[1:])))
        rms = float(np.sqrt((p * p).mean()))
        assert abs(rms - want) < 1e-4 * want + 1e-7, (name, sz, rms, want)
        checked += 1
    assert checked >= 2


def test_unit_var_norm_off_is_default():
    net_a, view_a = _views(CFG)
    net_b, view_b = _views(dataclasses.replace(CFG, unit_var_norm=False))
    for name, _, _ in net_a.named_params():
        np.testing.assert_array_equal(np.asarray(view_a[name]),
                                      np.asarray(view_b[name]))
