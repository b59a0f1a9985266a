"""ghn3_tpu — a TPU-native (JAX/XLA/Pallas) Graph HyperNetwork framework.

Re-designed from scratch with the capabilities of SamsungSAILMontreal/ghn3:
predict all parameters of arbitrary neural architectures in one forward pass,
meta-train the hypernetwork on DeepNets-1M, and evaluate/fine-tune target nets.
"""

__version__ = '0.1.0'

from .graph import GraphDef, GraphBatch, PRIMITIVES
from .config import GHNConfig
from .hypernet import GHN3

__all__ = ['GraphDef', 'GraphBatch', 'PRIMITIVES', 'GHNConfig', 'GHN3', '__version__']
