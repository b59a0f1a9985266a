"""Reconstruction of the ppuda.ghn.nn surface inherited by the reference GHN3:
GHN base class (embed, shape_enc, decoder_1d, bias_class, ln), ShapeEncoder, MLP, ConvDecoder.
Semantics are inferred from the reference call sites (/root/reference/ghn3/nn.py) and the
published GHN-2 paper/codebase behavior.
"""
import copy
import numpy as np
import torch
import torch.nn as nn

from ppuda.deepnets1m.genotypes import PRIMITIVES_DEEPNETS1M


def get_activation(activation):
    if activation is None:
        return nn.Identity()
    if activation == 'relu':
        return nn.ReLU(inplace=True)
    raise NotImplementedError(activation)


class MLP(nn.Module):
    def __init__(self, in_features=32, hid=(32, 32), activation='relu', last_activation='same'):
        super().__init__()
        assert len(hid) > 0, hid
        fc = []
        for j, n in enumerate(hid):
            fc.extend([nn.Linear(in_features if j == 0 else hid[j - 1], n),
                       get_activation(activation if j < len(hid) - 1 or last_activation == 'same'
                                      else last_activation)])
        self.fc = nn.Sequential(*fc)

    def forward(self, x, *args, **kwargs):
        if isinstance(x, tuple):
            x = x[0]
        return self.fc(x)


class GatedGNN(nn.Module):
    """Reconstruction of ppuda's GatedGNN (GHN-2 propagation) from the GHN-2
    paper (Knyazev et al. 2021, §3.2) and the reference call surface
    (/root/reference/ghn3/nn.py:257-259: ``self.gnn(x, edges, node_graph_ind)``
    with sparse (i, j, dist, graph_ind) edges and flat x).

    Spec: one forward + one backward sequential sweep along the DAG per round;
    node update h_v = GRU(m_v, h_v) where m_v averages MLP-transformed
    predecessor states over 1-hop edges plus 1/d-scaled mlp_ve messages over
    virtual edges; nodes at the same topological depth update together (no two
    same-depth nodes share an edge, so this equals strict sequential order).

    PROVENANCE CAVEAT: this is a shim reconstruction that shares its spec with
    ghn3_tpu/models/gatedgnn.py. Parity tests against it validate the reference
    GHN-2 *integration* (sparse batching, GHN-2 corner-crop tiling, decoder and
    grouping paths in /root/reference/ghn3/nn.py), not this module's fidelity to
    the real ppuda source, which is unavailable offline (see docs/PROVENANCE in
    the repo docs).
    """

    def __init__(self, in_features=32, ve=False, T=1):
        super().__init__()
        self.ve = ve
        self.T = T
        self.mlp = MLP(in_features=in_features, hid=(in_features, in_features))
        if ve:
            self.mlp_ve = MLP(in_features=in_features, hid=(in_features, in_features))
        self.gru = nn.GRUCell(in_features, in_features)

    def forward(self, x, edges, node_graph_ind):
        n = x.shape[0]
        counts = torch.bincount(node_graph_ind, minlength=int(node_graph_ind.max()) + 1)
        offsets = torch.cumsum(counts, 0) - counts
        src = (edges[:, 0] + offsets[edges[:, 3]]).long()
        dst = (edges[:, 1] + offsets[edges[:, 3]]).long()
        dist = edges[:, 2].float()

        a1 = torch.zeros(n, n, dtype=x.dtype)
        one_hop = dist == 1
        a1[src[one_hop], dst[one_hop]] = 1.0
        av = torch.zeros(n, n, dtype=x.dtype)
        if self.ve:
            virt = dist > 1
            av[src[virt], dst[virt]] = 1.0 / dist[virt]

        # longest-path depth per node over the 1-hop DAG
        levels = np.zeros(n, dtype=np.int64)
        a1np = a1.detach().numpy() > 0
        indeg = a1np.sum(0).astype(np.int64)
        from collections import deque
        q = deque(int(i) for i in np.where(indeg == 0)[0])
        rem = indeg.copy()
        while q:
            u = q.popleft()
            for v in np.where(a1np[u])[0]:
                levels[v] = max(levels[v], levels[u] + 1)
                rem[v] -= 1
                if rem[v] == 0:
                    q.append(int(v))
        max_level = int(levels.max()) if n else 0
        levels_t = torch.tensor(levels)

        h = x
        for _ in range(self.T):
            for backward in (False, True):
                a1d = a1.t() if backward else a1
                avd = av.t() if backward else av
                denom = (a1d.sum(0) + avd.sum(0)).clamp(min=1.0).unsqueeze(1)
                order = range(max_level, -1, -1) if backward else range(max_level + 1)
                for lvl in order:
                    upd = levels_t == lvl
                    if not bool(upd.any()):
                        continue
                    msg = a1d.t() @ self.mlp(h)
                    if self.ve:
                        msg = msg + avd.t() @ self.mlp_ve(h)
                    msg = msg / denom
                    h_new = self.gru(msg, h)
                    h = torch.where(upd.unsqueeze(1), h_new, h)
        return h


class ShapeEncoder(nn.Module):
    def __init__(self, hid, num_classes, max_shape, debug_level=0):
        super().__init__()
        assert max_shape[2] == max_shape[3], max_shape
        self.debug_level = debug_level
        self.num_classes = num_classes
        self.ch_steps = (2 ** 3, 2 ** 6, 2 ** 12, 2 ** 13)
        self.channels = np.unique([1, 3, num_classes] +
                                  list(range(self.ch_steps[0], self.ch_steps[1], 2 ** 3)) +
                                  list(range(self.ch_steps[1], self.ch_steps[2], 2 ** 4)) +
                                  list(range(self.ch_steps[2], self.ch_steps[3] + 1, 2 ** 5)))

        self.spatial = np.unique(list(range(1, max(12, max_shape[3]), 2)) + [14, 16])

        self.channels_lookup = {c: i for i, c in enumerate(self.channels)}
        self.channels_lookup_training = copy.deepcopy(self.channels_lookup)
        for c in range(4, self.ch_steps[0]):
            self.channels_lookup[c] = self.channels_lookup[self.ch_steps[0]]
        for c in range(1, self.channels[-1]):
            if c not in self.channels_lookup:
                self.channels_lookup[c] = self.channels_lookup[self.channels[np.argmin(abs(self.channels - c))]]

        self.spatial_lookup = {c: i for i, c in enumerate(self.spatial)}
        self.spatial_lookup_training = copy.deepcopy(self.spatial_lookup)
        self.spatial_lookup[2] = self.spatial_lookup[3]
        for c in range(1, self.spatial[-1]):
            if c not in self.spatial_lookup:
                self.spatial_lookup[c] = self.spatial_lookup[self.spatial[np.argmin(abs(self.spatial - c))]]

        n_ch, n_s = len(self.channels), len(self.spatial)
        self.embed_spatial = torch.nn.Embedding(n_s + 1, hid // 4)
        self.embed_channel = torch.nn.Embedding(n_ch + 1, hid // 4)
        self.register_buffer('dummy_ind', torch.tensor([n_ch, n_ch, n_s, n_s], dtype=torch.long).view(1, 4),
                             persistent=False)

    def forward(self, x, params_map, predict_class_layers=True):
        shape_ind = self.dummy_ind.repeat(len(x), 1)

        self.printed_warning = False
        for node_ind in params_map:
            sz = params_map[node_ind][0]['sz']
            if sz is None:
                continue

            sz_org = sz
            if len(sz) == 1:
                sz = (sz[0], 1)
            if len(sz) == 2:
                sz = (sz[0], sz[1], 1, 1)
            if len(sz) == 3 and sz[0] == 1 and min(sz[1:]) > 1:
                # torchvision-ViT pos_embedding (1, tokens, dim): the same 4-D
                # conversion the reference applies graph-side (graph.py:878-884)
                s = int(sz[1] ** 0.5)
                sz = (1, sz[2], s, s)
            assert len(sz) == 4, sz

            if not predict_class_layers and params_map[node_ind][1] in ['cls_w', 'cls_b']:
                sz = (self.num_classes, *sz[1:])

            recognized_sz = 0
            for i in range(4):
                if i < 2:
                    shape_ind[node_ind, i] = self.channels_lookup[
                        sz[i] if sz[i] in self.channels_lookup else self.channels[-1]]
                    if self.debug_level and not self.printed_warning:
                        recognized_sz += int(sz[i] in self.channels_lookup_training)
                else:
                    shape_ind[node_ind, i] = self.spatial_lookup[
                        sz[i] if sz[i] in self.spatial_lookup else self.spatial[-1]]
                    if self.debug_level and not self.printed_warning:
                        recognized_sz += int(sz[i] in self.spatial_lookup_training)

            if self.debug_level and not self.printed_warning:
                if recognized_sz != 4:
                    print('WARNING: unrecognized shape %s' % str(sz_org))
                    self.printed_warning = True

        shape_embed = torch.cat(
            (self.embed_channel(shape_ind[:, 0]),
             self.embed_channel(shape_ind[:, 1]),
             self.embed_spatial(shape_ind[:, 2]),
             self.embed_spatial(shape_ind[:, 3])), dim=1)

        return x + shape_embed


class ConvDecoder(nn.Module):
    def __init__(self, in_features=32, hid=(64, 128), out_shape=None, num_classes=None):
        super().__init__()
        assert len(hid) > 0, hid
        self.out_shape = out_shape
        self.num_classes = num_classes

        self.fc = nn.Sequential(nn.Linear(in_features, hid[0] * out_shape[2] * out_shape[3]),
                                nn.ReLU())

        conv = []
        for j, n_hid in enumerate(hid):
            n_out = int(np.prod(out_shape[:2])) if j == len(hid) - 1 else hid[j + 1]
            conv.extend([nn.Conv2d(n_hid, n_out, 1),
                         get_activation(None if j == len(hid) - 1 else 'relu')])
        self.conv = nn.Sequential(*conv)

        self.class_layer_predictor = nn.Sequential(
            get_activation('relu'),
            nn.Conv2d(out_shape[0], num_classes, 1))


class GHN(nn.Module):
    def __init__(self, max_shape, num_classes, hypernet='gatedgnn', decoder='conv', weight_norm=False,
                 ve=False, layernorm=False, hid=32, debug_level=0):
        super().__init__()
        assert len(max_shape) == 4, max_shape
        self.layernorm = layernorm
        self.weight_norm = weight_norm
        self.ve = ve
        self.debug_level = debug_level
        self.num_classes = num_classes
        self.hid = hid
        self.max_shape = max_shape

        if layernorm:
            self.ln = nn.LayerNorm(hid)

        self.embed = torch.nn.Embedding(len(PRIMITIVES_DEEPNETS1M), hid)
        self.shape_enc = ShapeEncoder(hid=hid, num_classes=num_classes, max_shape=max_shape,
                                      debug_level=debug_level)

        # The GHN-3 subclass replaces self.gnn and self.decoder; the GHN-2 path
        # (is_ghn2=True) keeps this GatedGNN (reference nn.py:146 gates the
        # graphormer construction on `not self._is_ghn2`).
        if hypernet == 'gatedgnn':
            self.gnn = GatedGNN(in_features=hid, ve=ve)
        max_ch = max(max_shape[:2])
        self.decoder_1d = MLP(in_features=hid, hid=(hid * 2, 2 * max_ch), last_activation=None)
        self.bias_class = nn.Sequential(nn.ReLU(), nn.Linear(max_ch, num_classes))
