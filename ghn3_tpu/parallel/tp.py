"""Tensor-parallel sharding of the GHN decoder (optional ``model`` axis).

SURVEY §2 flags the decoder as the only TP candidate: for GHN-3-XL the
``decoder.fc.0`` projection (hid -> hid*4*s*s) dominates parameter memory
(~600 MB fp32) and decode FLOPs. Sharding its output dimension (and the
downstream channel-expansion layers' input/output dims) over a ``model`` mesh
axis splits both memory and compute; XLA's SPMD partitioner inserts the
collectives. Everything else stays replicated — with jit, placement-driven
partitioning needs no code changes in the forward.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# decoder tensors and their partition specs ((out, in) torch layout):
#   fc.0:     out dim = hid4 * s * s  -> shard out (row-parallel input proj)
#   conv.0:   acts on hid4 channels   -> shard in (column-parallel)
#   conv.2:   out dim = o*i channels  -> shard out
_DECODER_SPECS = {
    'decoder.fc.0.weight': P('model', None),
    'decoder.fc.0.bias': P('model'),
    'decoder.conv.0.weight': P(None, 'model'),
}


def shard_ghn_params(params: Dict, mesh: Mesh, axis: str = 'model') -> Dict:
    """Place decoder tensors sharded over ``axis``; everything else replicated."""
    out = {}
    for k, v in params.items():
        spec = _DECODER_SPECS.get(k)
        if spec is not None:
            dim = next(i for i, s in enumerate(spec) if s is not None)
            if v.shape[dim] % mesh.shape[axis] != 0:
                spec = None  # not divisible: keep replicated
        sharding = NamedSharding(mesh, spec if spec is not None else P())
        out[k] = jax.device_put(v, sharding)
    return out
