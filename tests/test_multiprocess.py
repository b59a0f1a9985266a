"""Multi-process data parallelism: two OS processes (2 CPU devices each) joined
via jax.distributed.initialize produce the SAME updated parameters as a
single-process run on the same global batch — the gradient all-reduce the
reference gets from torchrun+DDP (ddp_utils.py:21-47) comes from the SPMD
partitioner over the global mesh here (VERDICT round-1 item 9)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_step_equals_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / 'mp_params.npz')
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu', 'PYTHONPATH':
           REPO + os.pathsep + os.path.join(REPO, 'tests')}
    env.pop('XLA_FLAGS', None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tests', 'mp_worker.py'),
         str(i), '2', str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outputs.append(stdout.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f'worker {i} failed:\n{outputs[i][-3000:]}'

    # single-process reference on the same global batch (4 local devices via
    # the conftest's 8-device CPU mesh; use 4 to match the 2x2 global mesh)
    import jax
    from ghn3_tpu.parallel.mesh import data_mesh
    from tests_mp_common import build_trainer, global_batch

    mesh = data_mesh(n_devices=4)
    trainer = build_trainer(mesh)
    images, labels = global_batch()
    trainer.update(images, labels)

    got = np.load(out)
    for k, v in trainer.model_params.items():
        np.testing.assert_allclose(got[k], np.asarray(v), atol=1e-5, rtol=1e-5,
                                   err_msg=f'multi-process grad mismatch: {k}')
