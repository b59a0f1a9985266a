"""GHN configuration."""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class GHNConfig:
    """Hyperparameters of a GHN-3 hypernetwork.

    Field semantics mirror the reference constructor (/root/reference/ghn3/nn.py:140-172)
    so pretrained checkpoints can be described exactly.
    """
    hid: int = 64
    heads: int = 8
    layers: int = 3
    max_shape: Tuple[int, int, int, int] = (64, 64, 16, 16)
    num_classes: int = 10
    ve: bool = True                  # virtual edges (shortest-path edge values)
    ve_cutoff: int = 50
    weight_norm: bool = True         # fan-in renormalization of predicted tensors
    # Off-protocol extension (no reference analogue): RMS-normalize each
    # decoded >1-D tensor to unit scale BEFORE the fan-in rescale, so predicted
    # weights land at exactly-He magnitude with predicted direction. Motivated
    # by the bnfree control (RESULTS.md): with the reference rule alone the
    # decoded values' small RMS collapses activations through norm-free nets
    # and the meta-gradient vanishes; BN nets are immune (BN rescales).
    unit_var_norm: bool = False
    layernorm: bool = True           # final LN over node embeddings
    is_ghn2: bool = False
    mlp_ratio: int = 4
    max_degree: int = 100            # centrality embedding clip
    max_input_dist: int = 1000       # input-distance embedding clip
    edge_vocab: int = 257            # edge-distance embedding rows (255 + 2)
    dtype: str = 'float32'           # compute dtype of the graphormer stack
    flash: bool = False              # Pallas fused attention (TPU, large N, fwd-only)
    flash_min_nodes: int = 256       # below this, XLA fusion already wins
    # matmul precision override for the fp32 predict path: None keeps the
    # parity default ('highest' = 6-pass bf16 emulation on the TPU MXU).
    # 'high' (3-pass) halves decode-matmul cost at ~1e-6 relative error —
    # far inside the 1e-2 norm-check tolerance (reference nn.py:783-797)
    matmul_precision: str = None

    def __post_init__(self):
        object.__setattr__(self, 'max_shape', tuple(self.max_shape))
        assert len(self.max_shape) == 4, self.max_shape
        assert self.max_shape[2] == self.max_shape[3], self.max_shape
        assert self.hid % self.heads == 0, (self.hid, self.heads)

    @property
    def max_ch(self) -> int:
        return max(self.max_shape[:2])

    @property
    def spatial(self) -> int:
        return self.max_shape[2]

    @staticmethod
    def ghn3_t() -> 'GHNConfig':
        """GHN-3-T/m8 (ghn3tm8.pt): hid 64, 3 layers, 8 heads, CIFAR head."""
        return GHNConfig(hid=64, heads=8, layers=3, max_shape=(64, 64, 11, 11), num_classes=10)

    @staticmethod
    def ghn3_s() -> 'GHNConfig':
        return GHNConfig(hid=128, heads=16, layers=5, max_shape=(64, 64, 11, 11), num_classes=10)

    @staticmethod
    def ghn3_l() -> 'GHNConfig':
        return GHNConfig(hid=256, heads=16, layers=12, max_shape=(64, 64, 11, 11), num_classes=10)

    @staticmethod
    def ghn3_xl() -> 'GHNConfig':
        """GHN-3-XL/m16 (ghn3xlm16.pt): hid 384, 24 layers, ImageNet head."""
        return GHNConfig(hid=384, heads=16, layers=24, max_shape=(64, 64, 16, 16), num_classes=1000)
