"""Reconstruction of ppuda.deepnets1m.genotypes surface (from call sites in the reference)."""
from collections import namedtuple

Genotype = namedtuple('Genotype', 'normal normal_concat reduce reduce_concat')

PRIMITIVES_DEEPNETS1M = [
    'max_pool',
    'avg_pool',
    'sep_conv',
    'dil_conv',
    'conv',
    'msa',
    'cse',
    'sum',
    'concat',
    'input',
    'bias',
    'bn',
    'ln',
    'pos_enc',
    'glob_avg',
]


def from_dict(d):
    return Genotype(normal=[tuple(x) for x in d['normal']],
                    normal_concat=list(d['normal_concat']),
                    reduce=[tuple(x) for x in d['reduce']],
                    reduce_concat=list(d['reduce_concat']))


def to_dict(g):
    return {'normal': [list(x) for x in g.normal],
            'normal_concat': list(g.normal_concat),
            'reduce': [list(x) for x in g.reduce],
            'reduce_concat': list(g.reduce_concat)}
