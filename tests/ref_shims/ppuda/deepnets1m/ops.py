"""Reconstruction of ppuda.deepnets1m.ops surface used by the reference."""
import torch
import torch.nn as nn


def parse_op_ks(op):
    """'sep_conv_5x5' -> ('sep_conv', 5); 'msa' -> ('msa', 3); 'conv' -> ('conv', 3)."""
    pos = op.rfind('x')
    if pos > 0 and op[pos - 1].isdigit() and op[pos + 1:].isdigit():
        p2 = op[:pos].rfind('_')
        return op[:p2], int(op[pos + 1:])
    return op, 3


class PosEnc(nn.Module):
    def __init__(self, C, ks):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, C, ks, ks))

    def forward(self, x):
        return x + self.weight
