"""Reconstruction of ppuda.deepnets1m.net surface used by the reference."""
import torch
import torch.nn as nn


def get_cell_ind(param_name, layers=1):
    if param_name.find('cells.') >= 0:
        sub = param_name[len('cells.'):]
        p = sub.find('.')
        cell_ind = int(sub if p == -1 else sub[:p])
    elif param_name.startswith('classifier') or param_name.startswith('auxiliary'):
        cell_ind = layers - 1
    elif layers == 1 or param_name.startswith('stem') or param_name.startswith('pos_enc'):
        cell_ind = 0
    else:
        cell_ind = None
    return cell_ind


def named_layered_modules(model):
    if hasattr(model, 'module'):  # DDP-wrapped
        model = model.module
    layers = model._n_cells if hasattr(model, '_n_cells') else 1
    layered_modules = [{} for _ in range(layers)]
    cell_ind = 0
    for module_name, m in model.named_modules():
        cell_ind_ = get_cell_ind(module_name, layers)
        if cell_ind_ is not None:
            cell_ind = cell_ind_

        is_w = hasattr(m, 'weight') and m.weight is not None
        is_b = hasattr(m, 'bias') and m.bias is not None
        is_proj_w = hasattr(m, 'in_proj_weight') and m.in_proj_weight is not None
        is_proj_b = hasattr(m, 'in_proj_bias') and m.in_proj_bias is not None
        is_pos_enc = hasattr(m, 'pos_embedding') and m.pos_embedding is not None

        if is_w or is_b or is_proj_w or is_proj_b or is_pos_enc:
            if module_name.startswith('module.'):
                module_name = module_name[len('module.'):]
            if is_w or is_proj_w or is_pos_enc:
                # pos_embedding is keyed WITH a '.weight' suffix: the reference
                # looks it up as p_ + '.weight' (nn.py:620-621 — the raw node
                # name 'encoder.pos_embedding' has no recognized suffix) and its
                # _set_params has a live Encoder branch (nn.py:521-522), which
                # is only reachable if this lookup succeeds.
                key = module_name + ('.in_proj_weight' if is_proj_w else
                                     ('.pos_embedding.weight' if is_pos_enc else '.weight'))
                w = m.in_proj_weight if is_proj_w else (m.pos_embedding if is_pos_enc else m.weight)
                sz = tuple(w) if isinstance(w, (list, tuple)) else tuple(w.shape)
                layered_modules[cell_ind][key] = {'param_name': key, 'module': m, 'is_w': True, 'sz': sz}
            if is_b or is_proj_b:
                key = module_name + ('.in_proj_bias' if is_proj_b else '.bias')
                w = m.in_proj_bias if is_proj_b else m.bias
                sz = tuple(w) if isinstance(w, (list, tuple)) else tuple(w.shape)
                layered_modules[cell_ind][key] = {'param_name': key, 'module': m, 'is_w': False, 'sz': sz}

    return layered_modules


def drop_path(x, drop_prob):
    if drop_prob > 0.:
        keep_prob = 1. - drop_prob
        mask = torch.bernoulli(torch.full((x.size(0), 1, 1, 1), keep_prob, device=x.device))
        x = x / keep_prob * mask
    return x


def _is_none(mod):
    if mod is None:
        return True
    try:
        named = dict(mod.named_modules())
        mods = [mod] + list(named.values())
    except Exception:
        mods = [mod]
    for m in mods:
        if hasattr(m, 'weight') and m.weight is None and not isinstance(getattr(m, 'weight', 0), (list, tuple)):
            return True
    return False


class AuxiliaryHeadCIFAR(nn.Module):
    def __init__(self, C, num_classes, norm='bn', pool_sz=5):
        super().__init__()
        self.features = nn.Sequential(
            nn.ReLU(inplace=True),
            nn.AvgPool2d(pool_sz, stride=3, padding=0, count_include_pad=False),
            nn.Conv2d(C, 128, 1, bias=False),
            nn.BatchNorm2d(128),
            nn.ReLU(inplace=True),
            nn.Conv2d(128, 768, 2, bias=False),
            nn.BatchNorm2d(768),
            nn.ReLU(inplace=True))
        self.classifier = nn.Linear(768, num_classes)

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.view(x.size(0), -1))


class AuxiliaryHeadImageNet(nn.Module):
    def __init__(self, C, num_classes, norm='bn'):
        super().__init__()
        self.features = nn.Sequential(
            nn.ReLU(inplace=True),
            nn.AvgPool2d(5, stride=2, padding=0, count_include_pad=False),
            nn.Conv2d(C, 128, 1, bias=False),
            nn.BatchNorm2d(128),
            nn.ReLU(inplace=True),
            nn.Conv2d(128, 768, 2, bias=False),
            nn.BatchNorm2d(768),
            nn.ReLU(inplace=True))
        self.classifier = nn.Linear(768, num_classes)

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.view(x.size(0), -1))


class Network(nn.Module):
    """Placeholder type used only in isinstance checks by the reference graph code."""
    pass
