"""Shape encoder: maps parameter-tensor shapes to embedding indices.

TPU-first split of the reference ShapeEncoder (ppuda surface, SURVEY §2.9): the
dictionary lookups run on the host at graph-compile time, producing a static
``shape_ind`` int array; the device side is two embedding gathers. The vocabulary
construction must match the reference exactly — pretrained embedding rows are
indexed by these tables.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import GHNConfig


class ShapeTables:
    """Channel / spatial vocabularies + nearest-neighbor lookups."""

    def __init__(self, num_classes: int, max_spatial: int):
        ch_steps = (2 ** 3, 2 ** 6, 2 ** 12, 2 ** 13)
        self.channels = np.unique(
            [1, 3, num_classes]
            + list(range(ch_steps[0], ch_steps[1], 2 ** 3))
            + list(range(ch_steps[1], ch_steps[2], 2 ** 4))
            + list(range(ch_steps[2], ch_steps[3] + 1, 2 ** 5)))
        self.spatial = np.unique(list(range(1, max(12, max_spatial), 2)) + [14, 16])

        self.channels_lookup: Dict[int, int] = {int(c): i for i, c in enumerate(self.channels)}
        for c in range(4, ch_steps[0]):
            self.channels_lookup[c] = self.channels_lookup[ch_steps[0]]
        for c in range(1, int(self.channels[-1])):
            if c not in self.channels_lookup:
                self.channels_lookup[c] = self.channels_lookup[
                    int(self.channels[np.argmin(abs(self.channels - c))])]

        self.spatial_lookup: Dict[int, int] = {int(s): i for i, s in enumerate(self.spatial)}
        self.spatial_lookup[2] = self.spatial_lookup[3]
        for s in range(1, int(self.spatial[-1])):
            if s not in self.spatial_lookup:
                self.spatial_lookup[s] = self.spatial_lookup[
                    int(self.spatial[np.argmin(abs(self.spatial - s))])]

    @property
    def n_channels(self) -> int:
        return len(self.channels)

    @property
    def n_spatial(self) -> int:
        return len(self.spatial)

    @property
    def dummy_index(self) -> Tuple[int, int, int, int]:
        # nodes without a parameter shape use the extra embedding row
        return (self.n_channels, self.n_channels, self.n_spatial, self.n_spatial)

    def channel_index(self, c: int) -> int:
        return self.channels_lookup.get(int(c), self.n_channels - 1)

    def spatial_index(self, s: int) -> int:
        return self.spatial_lookup.get(int(s), self.n_spatial - 1)

    def shape_index(self, sz: Optional[Tuple[int, ...]]) -> Tuple[int, int, int, int]:
        """4-way (out_ch, in_ch, kh, kw) vocab indices for one parameter shape."""
        if sz is None:
            return self.dummy_index
        if len(sz) == 1:
            sz = (sz[0], 1)
        if len(sz) == 2:
            sz = (sz[0], sz[1], 1, 1)
        if len(sz) == 3 and sz[0] == 1 and min(sz[1:]) > 1:
            # ViT positional embedding (1, tokens, dim): same 4-D spatial
            # conversion as the graph side (reference graph.py:878-884), so
            # the shape embedding is consistent with DeepNets-1M pos_enc nodes
            s = int(math.floor(sz[1] ** 0.5))
            sz = (1, sz[2], s, s)
        assert len(sz) == 4, sz
        return (self.channel_index(sz[0]), self.channel_index(sz[1]),
                self.spatial_index(sz[2]), self.spatial_index(sz[3]))


@functools.lru_cache(maxsize=8)
def shape_tables(num_classes: int, max_spatial: int) -> ShapeTables:
    return ShapeTables(num_classes, max_spatial)


def tables_for(cfg: GHNConfig) -> ShapeTables:
    return shape_tables(cfg.num_classes, cfg.spatial)
