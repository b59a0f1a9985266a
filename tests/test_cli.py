"""CLI entry points: end-to-end smoke runs as subprocesses (CPU, tiny configs)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):  # generous: XLA compiles stall under CPU contention
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_train_ghn_cli(tmp_path):
    out = _run(['cli/train_ghn.py', '-d', 'synthetic', '-e', '1', '-m', '2',
                '--hid', '16', '--heads', '2', '--layers', '1', '--ln',
                '--weight_norm', '-b', '16', '--save', str(tmp_path),
                '--name', 'smoke', '--max_steps', '2', '--pool_size', '1',
                '--platform', 'cpu', '--log_interval', '1'])
    assert 'done' in out
    assert 'loss=' in out


@pytest.mark.slow
def test_train_net_cli_with_ghn_init(tmp_path):
    # save a tiny GHN checkpoint, then train a convnet from its predicted init
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from ghn3_tpu import GHN3, GHNConfig;"
            "GHN3(GHNConfig(hid=16, heads=2, layers=1, max_shape=(16,16,11,11),"
            "num_classes=10), seed=0).save(r'%s')" % (tmp_path / 'ghn.npz'))
    _run(['-c', code])
    out = _run(['cli/train_net.py', '-d', 'synthetic', '--arch', 'convnet',
                '-e', '1', '-b', '16', '--lr', '0.05', '--save', str(tmp_path),
                '--name', 'smoke2', '--max_steps', '2',
                '--ckpt', str(tmp_path / 'ghn.npz'),
                '--platform', 'cpu', '--log_interval', '1'])
    assert 'initialized' in out and 'done' in out


@pytest.mark.slow
def test_train_net_cli_deepnets_index(tmp_path):
    # the reference's ppuda train_net surface: --arch <idx> trains the idx-th
    # net of a DeepNets-1M split (reference train_ddp.py -> ppuda init_config)
    pytest.importorskip('torch')
    from conftest import reference_available
    if not reference_available():
        pytest.skip('reference repo not mounted (fixture builder needs it)')
    from deepnets_fixture import build_fixture
    nets_dir = str(tmp_path / 'dn1m')
    os.makedirs(nets_dir)
    build_fixture(nets_dir)
    out = _run(['cli/train_net.py', '-d', 'synthetic', '--arch', '1',
                '--split', 'val', '--nets_dir', nets_dir,
                '-e', '1', '-b', '8', '--max_steps', '1', '--imsize', '32',
                '--save', '', '--platform', 'cpu', '--log_interval', '1'])
    assert 'DeepNets-1M val[1]' in out
    assert 'done' in out


def test_convert_ckpt_cli(tmp_path):
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from ghn3_tpu import GHN3, GHNConfig;"
            "GHN3(GHNConfig(hid=16, heads=2, layers=1, max_shape=(16,16,11,11),"
            "num_classes=10), seed=0).save(r'%s')" % (tmp_path / 'a.npz'))
    _run(['-c', code])
    out = _run(['cli/convert_ckpt.py', str(tmp_path / 'a.npz'), str(tmp_path / 'b.npz')])
    assert 'converted' in out
    assert os.path.exists(tmp_path / 'b.npz')
