"""Worker process for the multi-process data-parallel test (launched by
tests/test_multiprocess.py). Runs one Trainer step of a tiny classifier over a
2-process CPU mesh and dumps the updated parameters (process 0).

Replaces the reference's torchrun+Gloo CPU test path (ddp_utils.py:21-47):
jax.distributed.initialize + a global mesh + jit auto-partitioning give the
gradient all-reduce with no explicit collectives.
"""
import os
import sys

proc_id, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                           num_processes=nprocs, process_id=proc_id)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ghn3_tpu.parallel.mesh import data_mesh  # noqa: E402
from tests_mp_common import build_trainer, global_batch  # noqa: E402

assert len(jax.devices()) == 2 * nprocs, jax.devices()
mesh = data_mesh()
trainer = build_trainer(mesh)
images, labels = global_batch()
trainer.update(images, labels)

if proc_id == 0:
    params = {k: np.asarray(v) for k, v in trainer.model_params.items()}
    np.savez(out_path, **params)
print(f'worker {proc_id} done', flush=True)
