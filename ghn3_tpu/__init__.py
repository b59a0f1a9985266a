"""ghn3_tpu — a TPU-native (JAX/XLA/Pallas) Graph HyperNetwork framework.

Re-designed from scratch with the capabilities of SamsungSAILMontreal/ghn3:
predict all parameters of arbitrary neural architectures in one forward pass,
meta-train the hypernetwork on DeepNets-1M, and evaluate/fine-tune target nets.
"""

__version__ = '0.1.0'

from .graph import GraphDef, GraphBatch, PRIMITIVES
from .config import GHNConfig
from .hypernet import GHN3
from .metadata import get_metadata, norm_check

# the reference's flagship entry point is a top-level function
# (`from ghn3 import from_pretrained`, nn.py); keep that spelling working
from_pretrained = GHN3.from_pretrained

# heavier subsystems are imported lazily by their modules:
#   ghn3_tpu.parallel.trainer.Trainer      training loop (GHN meta / classifier)
#   ghn3_tpu.predict.{predict_batch,predict_packed}
#   ghn3_tpu.data.deepnets1m.DeepNets1M    architecture dataset
#   ghn3_tpu.data.deepnets1m_writer        dataset generation (published layout)
#   ghn3_tpu.evaluate.{infer,predict_and_eval_suite,adjust_net_f}
#   ghn3_tpu.torch_interop.adjust_net      small-image model surgery (ppuda)

__all__ = ['GraphDef', 'GraphBatch', 'PRIMITIVES', 'GHNConfig', 'GHN3',
           'from_pretrained', 'get_metadata', 'norm_check', '__version__']
