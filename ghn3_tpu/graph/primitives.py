"""Primitive op vocabulary of the GHN graph IR.

The 15-way vocabulary and its order are load-bearing: the GHN's op-type embedding
table is indexed by these integers, so any pretrained checkpoint depends on this
exact ordering (reference: ppuda.deepnets1m.genotypes.PRIMITIVES_DEEPNETS1M, used
at /root/reference/ghn3/graph.py:29,811).
"""

from __future__ import annotations

PRIMITIVES = (
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
)

PRIMITIVE_INDEX = {op: i for i, op in enumerate(PRIMITIVES)}

NUM_PRIMITIVES = len(PRIMITIVES)

# 4-char prefixes are unique; used for fast lookups when decoding dataset records
# (reference: deepnets1m.py:56-58).
PRIMITIVE_INDEX_4 = {op[:4]: i for i, op in enumerate(PRIMITIVES)}
assert len(PRIMITIVE_INDEX_4) == NUM_PRIMITIVES
