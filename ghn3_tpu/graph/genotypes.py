"""Genotype (cell op-list) structures of the DeepNets-1M dataset
(ppuda surface, SURVEY §2.9: `from_dict`, PRIMITIVES_DEEPNETS1M is in
primitives.py)."""

from __future__ import annotations

from collections import namedtuple

Genotype = namedtuple('Genotype', 'normal normal_concat reduce reduce_concat')


def from_dict(d) -> Genotype:
    return Genotype(normal=[tuple(x) for x in d['normal']],
                    normal_concat=list(d['normal_concat']),
                    reduce=[tuple(x) for x in d['reduce']],
                    reduce_concat=list(d['reduce_concat']))


def to_dict(g: Genotype) -> dict:
    return {'normal': [list(x) for x in g.normal],
            'normal_concat': list(g.normal_concat),
            'reduce': [list(x) for x in g.reduce],
            'reduce_concat': list(g.reduce_concat)}


def parse_op_ks(op: str):
    """'sep_conv_5x5' -> ('sep_conv', 5); names without a kernel suffix get ks=3."""
    pos = op.rfind('x')
    if pos > 0 and op[pos - 1].isdigit() and op[pos + 1:].isdigit():
        p2 = op[:pos].rfind('_')
        return op[:p2], int(op[pos + 1:])
    return op, 3


def random_genotype(rng, steps: int = 2,
                    ops=('sep_conv_3x3', 'conv_3x3', 'max_pool_3x3', 'skip_connect',
                         'dil_conv_3x3', 'avg_pool_3x3', 'none'),
                    reduce_steps=None) -> Genotype:
    """Sample a DARTS-space genotype: 2 ops per step, inputs drawn from earlier
    states, concat of all intermediate states (the DeepNets-1M generator family,
    ppuda surface SURVEY §2.9)."""
    reduce_steps = steps if reduce_steps is None else reduce_steps

    def cell_ops(n):
        return [(str(rng.choice(list(ops))), int(rng.integers(0, i // 2 + 2)))
                for i in range(2 * n)]

    return Genotype(normal=cell_ops(steps), normal_concat=list(range(2, steps + 2)),
                    reduce=cell_ops(reduce_steps),
                    reduce_concat=list(range(2, reduce_steps + 2)))


# The ViT genotype used by DeepNets-1M for pure-transformer nets.
VIT = Genotype(normal=[('msa', 0), ('skip_connect', 1)], normal_concat=[2],
               reduce=[('msa', 0), ('skip_connect', 1)], reduce_concat=[2])

# DARTS search-space cell (Liu et al. 2019), used for predefined baselines.
DARTS = Genotype(
    normal=[('sep_conv_3x3', 0), ('sep_conv_3x3', 1), ('sep_conv_3x3', 0),
            ('sep_conv_3x3', 1), ('sep_conv_3x3', 1), ('skip_connect', 0),
            ('skip_connect', 0), ('dil_conv_3x3', 2)],
    normal_concat=[2, 3, 4, 5],
    reduce=[('max_pool_3x3', 0), ('max_pool_3x3', 1), ('skip_connect', 2),
            ('max_pool_3x3', 1), ('max_pool_3x3', 0), ('skip_connect', 2),
            ('skip_connect', 2), ('max_pool_3x3', 1)],
    reduce_concat=[2, 3, 4, 5])
