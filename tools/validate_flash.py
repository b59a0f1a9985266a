#!/usr/bin/env python
"""On-device validation + micro-benchmark of the Pallas flash edge-bias
attention kernel against the XLA reference path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ghn3_tpu.ops.edge_attention import flash_bias_attention, reference_bias_attention


def main():
    rng = np.random.default_rng(0)
    for bh, n, d in [(16, 256, 24), (16, 512, 24), (32, 1024, 24)]:
        q = rng.normal(size=(bh, n, d)).astype(np.float32)
        k = rng.normal(size=(bh, n, d)).astype(np.float32)
        v = rng.normal(size=(bh, n, d)).astype(np.float32)
        bias = rng.normal(size=(bh, n, n)).astype(np.float32)
        bias[:, :, -n // 8:] = -2.0 ** 15
        scale = d ** -0.5
        args = tuple(map(jnp.asarray, (q, k, v, bias)))

        def _ref(q, k, v, b):
            with jax.default_matmul_precision('highest'):
                return reference_bias_attention(q, k, v, b, scale)
        ref_fn = jax.jit(_ref)
        out_ref = np.asarray(ref_fn(*args))
        out = np.asarray(flash_bias_attention(*args, scale=scale))
        err = np.abs(out - out_ref).max()
        print(f'BH={bh} N={n} d={d}: max|flash-xla|={err:.2e}')
        assert err < 5e-4, err

        for name, fn in (('xla', lambda: ref_fn(*args)),
                         ('flash', lambda: flash_bias_attention(*args, scale=scale))):
            fn()  # warm
            reps = 20
            t0 = time.time()
            for _ in range(reps):
                r = fn()
            jax.block_until_ready(r)
            print(f'  {name}: {(time.time() - t0) / reps * 1e3:.2f} ms')


if __name__ == '__main__':
    main()
