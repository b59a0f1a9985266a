"""PyTorch target-model interop: parameter tables and setters.

Gives the reference's one-liner API (`model = ghn(model)`) for arbitrary torch
modules: a table of predictable tensors per cell (the ppuda
`named_layered_modules` surface, SURVEY §2.9) and setters that copy predicted
numpy tensors into the module parameters. Imports torch lazily — the rest of the
framework never needs it.
"""

from __future__ import annotations

import numpy as np

from .graph.torch_trace import get_cell_ind
from .predict import TargetParam, TargetTable


def _make_setter(module, w_key: str, b_key: str):
    import torch

    def set_fn(tensor: np.ndarray, is_w: bool):
        key = w_key if is_w else b_key
        target = getattr(module, key)
        t = torch.from_numpy(np.asarray(tensor, dtype=np.float32))
        if isinstance(target, torch.Tensor):
            if target.dim() == 4 and t.dim() == 2:
                t = t[:, :, None, None]  # 1x1 convs decoded as 2d (e.g. squeezenet head)
            assert tuple(target.shape) == tuple(t.shape), (key, tuple(target.shape), tuple(t.shape))
            target.data = t
        else:  # shape-only placeholder (lightweight skeletons)
            setattr(module, key, t)
    return set_fn


def torch_param_table(model) -> TargetTable:
    """Per-cell tables of predictable parameter tensors of a torch model."""
    if hasattr(model, 'module'):  # DDP-style wrappers
        model = model.module
    n_cells = getattr(model, '_n_cells', 1)
    table: TargetTable = [{} for _ in range(n_cells)]
    cell_ind = 0
    for module_name, m in model.named_modules():
        ci = get_cell_ind(module_name, n_cells)
        if ci is not None:
            cell_ind = ci

        is_w = getattr(m, 'weight', None) is not None
        is_b = getattr(m, 'bias', None) is not None
        is_proj_w = getattr(m, 'in_proj_weight', None) is not None
        is_proj_b = getattr(m, 'in_proj_bias', None) is not None
        is_pos_enc = getattr(m, 'pos_embedding', None) is not None
        if not (is_w or is_b or is_proj_w or is_proj_b or is_pos_enc):
            continue
        if module_name.startswith('module.'):
            module_name = module_name[len('module.'):]

        if is_w or is_proj_w or is_pos_enc:
            w_key = 'in_proj_weight' if is_proj_w else ('pos_embedding' if is_pos_enc else 'weight')
            b_key = 'in_proj_bias' if is_proj_w else 'bias'
            w = getattr(m, w_key)
            sz = tuple(w) if isinstance(w, (list, tuple)) else tuple(w.shape)
            # pos_embedding is looked up as '<node name>.weight' (predict.py
            # _candidate_names appends '.weight' to unsuffixed node names,
            # mirroring reference nn.py:620-621), so key it accordingly
            t_key = module_name + '.' + w_key + ('.weight' if is_pos_enc else '')
            table[cell_ind][t_key] = TargetParam(
                sz=sz, is_w=True, set_fn=_make_setter(m, w_key, b_key))
        if is_b or is_proj_b:
            b_key = 'in_proj_bias' if is_proj_b else 'bias'
            w_key = 'in_proj_weight' if is_proj_b else 'weight'
            b = getattr(m, b_key)
            sz = tuple(b) if isinstance(b, (list, tuple)) else tuple(b.shape)
            table[cell_ind][module_name + '.' + b_key] = TargetParam(
                sz=sz, is_w=False, set_fn=_make_setter(m, w_key, b_key))
    return table


def set_bn_eval_without_stats(model) -> None:
    """Put BatchNorm layers into batch-stats mode so predicted parameters can be
    evaluated without running statistics (reference nn.py:333-342)."""
    import torch.nn as nn

    def visit(module):
        if isinstance(module, nn.BatchNorm2d):
            module.track_running_stats = False
            module.training = True
    model.apply(visit)


def total_param_norm(model) -> float:
    """L2 norm of the stacked per-tensor norms (reference norm_check, nn.py:783-797)."""
    import torch
    with torch.no_grad():
        norms = torch.stack([p.norm() for p in model.parameters()])
        return float(torch.norm(norms, 2).item())


def adjust_net(model, large_input: bool = False):
    """Small-image model surgery (reference eval_ghn.py:145, eval.py:39 via
    ppuda.utils.adjust_net): for 32x32-style inputs, relax the 224px stem —
    set the first strided conv's stride to 1 and disable the first max-pool —
    so torchvision-scale models evaluate on CIFAR without collapsing the
    spatial dims. Sets ``expected_input_sz`` accordingly and returns the model.
    """
    import torch.nn as nn

    model.expected_input_sz = 224 if large_input else 32
    if large_input:
        return model

    done_conv = done_pool = False
    for m in model.modules():
        if not done_conv and isinstance(m, nn.Conv2d) and max(m.stride) > 1:
            m.stride = (1, 1)
            done_conv = True
        elif done_conv and not done_pool and isinstance(m, nn.MaxPool2d):
            m.kernel_size, m.stride, m.padding = 1, 1, 0
            done_pool = True
        if done_conv and done_pool:
            break
    return model
