"""Reconstruction of ppuda.utils surface used by the reference."""
import numpy as np
import torch


def capacity(model, is_grad=True):
    c, n = 0, 0
    for p in model.parameters():
        if is_grad and not p.requires_grad:
            continue
        c += 1
        n += p.numel()
    return c, n


class AvgrageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.avg = 0.
        self.sum = 0.
        self.cnt = 0
        self.dispersion = 0.

    def update(self, val, n=1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


def accuracy(output, target, topk=(1,)):
    maxk = max(topk)
    batch_size = target.size(0)
    _, pred = output.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(target.view(1, -1).expand_as(pred))
    res = []
    for k in topk:
        correct_k = correct[:k].reshape(-1).float().sum(0)
        res.append(correct_k.mul_(100.0 / batch_size))
    return res


def rand_choice(values, n=None):
    values = np.asarray(values)
    return torch.tensor(np.random.choice(values[:len(values) if n is None else n]))


def init(model, orth=False, beta=0):
    if beta > 0:
        for p in model.parameters():
            p.data += beta * torch.randn_like(p.data)
    return model


def adjust_net(model, large_input=False):
    model.expected_input_sz = 224 if large_input else 32
    return model


def infer(model, loader, verbose=False):
    raise NotImplementedError('stub')
