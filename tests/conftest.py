import os
import sys

# Deterministic CPU mesh for tests (override any ambient TPU platform); real TPU
# runs use the driver's env. The environment's sitecustomize registers the TPU
# plugin at interpreter start, so the env var alone is not enough — force the
# platform through jax.config too.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE = '/root/reference'
SHIMS = os.path.join(REPO, 'tests', 'ref_shims')

# the torchvision/ppuda shims are visible to all tests (torchvision is not
# installed in this environment; zoo models optionally subclass its classes so
# the reference's isinstance-gated fixes engage during golden comparisons)
if SHIMS not in sys.path:
    sys.path.insert(0, SHIMS)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def enable_reference_import():
    """Make `import ghn3` (the reference) work via our test-only ppuda/torchvision shims.

    Used only by golden parity tests; the framework itself never imports the reference.
    """
    for p in (SHIMS, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
