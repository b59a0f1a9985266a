"""Fixture-gated published-checkpoint tests (docs/PROVENANCE.md).

These run automatically when the published files exist under ``./checkpoints/``
(or ``$GHN3_CKPT_DIR``) and SKIP otherwise — the harness is provably ready for
the artifacts even though this environment cannot download them (zero egress).

Drop-in instructions (README "Published checkpoints"):
    huggingface-cli download SamsungSAILMontreal/ghn3 ghn3tm8.pt ghn3xlm16.pt \
        resnet50_ghn3xlm16_init.pt ghn2.pt --local-dir ./checkpoints
    pytest -m ckpt

Covers: norm_check against the md5-pinned ghn3_results.json paramnorms (tol 1e-2,
reference nn.py:783-797, eval_ghn.py:162-169) and the exact-weight parity of the
published resnet50 init (reference notebook cell 7, allclose atol 1e-6).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

CKPT_DIR = os.environ.get('GHN3_CKPT_DIR',
                          os.path.join(os.path.dirname(__file__), '..', 'checkpoints'))

pytestmark = pytest.mark.ckpt


def _ckpt(name: str) -> str:
    path = os.path.join(CKPT_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f'published checkpoint {name} not present under {CKPT_DIR}')
    return path


def _predict_resnet50(ghn):
    from ghn3_tpu.zoo.torch_zoo import TORCH_ZOO
    model = TORCH_ZOO['resnet50']()
    ghn(model, bn_track_running_stats=True, reduce_graph=True)
    return model


@pytest.mark.parametrize('name,arch_tol', [('ghn3tm8.pt', 1e-2),
                                           ('ghn3xlm16.pt', 1e-2)])
def test_norm_check_resnet50(name, arch_tol):
    from ghn3_tpu import GHN3
    from ghn3_tpu.metadata import norm_check
    ghn = GHN3.from_pretrained(_ckpt(name))
    model = _predict_resnet50(ghn)
    assert norm_check(model, arch='resnet50', ghn3_name=name, tol=arch_tol), \
        f'{name}: resnet50 paramnorm check failed (tol {arch_tol})'


def test_resnet50_init_exact_parity():
    """Per-parameter allclose against the published predicted-weights file
    (reference examples/ghn_all_pytorch.ipynb cell 7, atol 1e-6)."""
    from ghn3_tpu import GHN3
    path = _ckpt('resnet50_ghn3xlm16_init.pt')
    ghn = GHN3.from_pretrained(_ckpt('ghn3xlm16.pt'))
    model = _predict_resnet50(ghn)
    ref_sd = torch.load(path, map_location='cpu', weights_only=False)
    if hasattr(ref_sd, 'state_dict'):
        ref_sd = ref_sd.state_dict()
    ours = dict(model.named_parameters())
    n_checked = 0
    for k, v in ref_sd.items():
        if k not in ours:
            continue
        np.testing.assert_allclose(ours[k].detach().numpy(),
                                   v.detach().cpu().numpy(), atol=1e-6,
                                   err_msg=f'predicted {k} differs from published init')
        n_checked += 1
    assert n_checked > 100, f'only {n_checked} parameters compared'


def test_ghn2_checkpoint_loads_and_norm_checks():
    """ghn2.pt: config inference (9-row spatial table, 4D->2D decoder conversion)
    + paramnorm — the only offline-impossible GatedGNN validation."""
    from ghn3_tpu import GHN3
    from ghn3_tpu.metadata import norm_check
    ghn = GHN3.from_pretrained(_ckpt('ghn2.pt'))
    assert ghn.config.is_ghn2
    model = _predict_resnet50(ghn)
    assert norm_check(model, arch='resnet50', ghn3_name='ghn2.pt', tol=1e-2), \
        'ghn2: resnet50 paramnorm check failed'
