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


# ---------------------------------------------------------------------------
# Quick-gate marking: tests measured >~20s on the 8-device CPU mesh carry the
# `slow` marker (list mirrors `--durations` of a full run), so
# `pytest -m "not slow"` is a <10-minute gate while `pytest tests/` keeps full
# coverage. Update the list when a test's cost changes materially.
# ---------------------------------------------------------------------------
import pytest as _pytest  # noqa: E402


@_pytest.fixture(autouse=True, scope='module')
def _free_compiled_programs_between_modules():
    """XLA:CPU's in-process compiler has segfaulted after several hundred
    compilations in one long pytest process (observed repeatedly on small
    hosts: a backend_compile_and_load frame, a different test each time, and
    every such test passes in isolation). Dropping the executable caches at
    module boundaries keeps the live-compilation footprint bounded; tests
    within a module still share their jitted programs."""
    yield
    jax.clear_caches()
    import gc
    gc.collect()


_SLOW_PATTERNS = (
    'test_cli.py::test_train_ghn_cli',
    'test_cli.py::test_train_net_cli_with_ghn_init',
    'test_deepnets.py::test_interp_stream_from_dataset',
    'test_deepnets.py::test_mixed_norm_interp_stream_trains',
    'test_deepnets.py::test_interpreter_on_dataset_records',
    'test_deepnets.py::test_meta_training_step_on_deepnets',
    'test_meta_executor.py::test_trainer_streams_unique_archs_zero_recompiles',
    'test_meta_executor.py::test_net_sharded_dp_matches_replicated',
    'test_trainer.py::test_nan_skip',
    'test_trainer.py::test_checkpoint_orbax_backend',
    'test_trainer.py::test_checkpoint_save_resume',
    'test_trainer.py::test_meta_training_step_decreases_loss',
    'test_trainer.py::test_meta_training_on_mesh',
    'test_jax_zoo_twins.py::test_twin_matches_torch[densenet121]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[densenet201]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[googlenet]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[convnext_tiny]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[convnext_tiny_ish]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[efficientnet',
    'test_jax_zoo_twins.py::test_twin_matches_torch[swin_t]',
    'test_jax_zoo_twins.py::test_twin_matches_torch[inception_v3]',
    'test_interpreter.py::test_interpreter_matches_network',
    'test_interpreter.py::test_ghn2_interpreter_matches_plan_path',
    'test_interpreter.py::test_bf16_compute_close_to_f32',
    'test_interpreter.py::test_zero_recompiles_within_bucket',
    'test_interpreter.py::test_custom_input_size_bucketed',
    'test_zoo_coverage.py::test_param_counts_match_torchvision',
    'test_zoo_coverage.py::test_zoo_graph_matches_reference[vgg16_bn]',
    'test_tp.py::test_tp_training_step',
    'test_ghn2.py::test_ghn2_meta_training_step',
    'test_multiprocess.py::test_two_process_step_equals_single_process',
    'test_evaluate.py::test_predict_packed_views',
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(_pytest.mark.slow)
