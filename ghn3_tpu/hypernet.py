"""User-facing GHN-3 hypernetwork object.

Mirrors the reference one-liner API (README.md:72-81):

    from ghn3_tpu import GHN3
    ghn = GHN3.from_pretrained('ghn3tm8.pt')
    model = ghn(model)           # torch module with predicted parameters

and adds the JAX-native path: targets exposing ``param_table()`` receive their
predicted tensors through table setters (functional nets collect them into a
param dict).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .config import GHNConfig
from . import checkpoint as ckpt
from .graph.graphdef import GraphBatch, GraphDef
from .models.ghn_core import init_ghn_params
from .predict import TargetTable


def _target_table(net) -> TargetTable:
    if isinstance(net, list) and (len(net) == 0 or isinstance(net[0], dict)):
        return net  # already a table
    if hasattr(net, 'param_table'):
        return net.param_table()
    if hasattr(net, 'named_modules'):  # torch module
        from .torch_interop import torch_param_table
        return torch_param_table(net)
    raise TypeError(f'cannot build a parameter table for target of type {type(net)}')


class GHN3:
    """Graph HyperNetwork (GHN-3) with JAX parameters."""

    def __init__(self, config: GHNConfig, params: Optional[Dict] = None, seed: int = 0):
        self.config = config
        self.params = params if params is not None else init_ghn_params(
            jax.random.PRNGKey(seed), config)

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str = 'ghn3xlm16.pt', **overrides) -> 'GHN3':
        """Load a checkpoint: our .npz, a published torch/joblib .pt file, or a
        model name resolved from the HF hub (SamsungSAILMontreal/ghn3), falling
        back to a local file (reference from_pretrained, nn.py:31-55)."""
        import os
        if not os.path.exists(path):
            try:
                from huggingface_hub import hf_hub_download
                path = hf_hub_download(repo_id='SamsungSAILMontreal/ghn3', filename=path)
            except Exception as e:
                raise FileNotFoundError(
                    f'checkpoint {path!r} not found locally and hub download failed: {e}')
        config, sd = ckpt.load_state_dict_file(path)
        known = set(GHNConfig.__dataclass_fields__)
        ignored = {k: v for k, v in overrides.items() if k not in known}
        if ignored:  # e.g. the reference's debug_level — accepted, not needed here
            from .utils.logging import log
            log(f'from_pretrained: ignoring non-config kwargs {sorted(ignored)}')
        overrides = {k: v for k, v in overrides.items() if k in known}
        if config is not None:
            cfg_kwargs = {k: v for k, v in dict(config).items() if k in known}
            cfg_kwargs.update(overrides)
            cfg = GHNConfig(**cfg_kwargs)
        else:
            cfg = ckpt.infer_config(sd, **overrides)
        params = ckpt.params_from_state_dict(sd, cfg)
        return cls(cfg, params=params)

    def save(self, path: str) -> None:
        ckpt.save_npz(path, self.params, self.config)

    def num_params(self) -> int:
        return int(sum(np.prod(v.shape) for v in self.params.values()))

    # ------------------------------------------------------------------
    def build_graphs(self, nets: Sequence[Any]) -> List[GraphDef]:
        graphs = []
        cutoff = self.config.ve_cutoff if self.config.ve else 1
        for net in nets:
            if isinstance(net, GraphDef):
                graphs.append(net)
            elif hasattr(net, 'graph_def'):
                graphs.append(net.graph_def(ve_cutoff=cutoff))
            elif hasattr(net, 'named_modules'):
                from .graph.torch_trace import trace_torch_model
                graphs.append(trace_torch_model(net, ve_cutoff=cutoff))
            else:
                raise TypeError(f'cannot build a graph for target of type {type(net)}')
        return graphs

    def __call__(self, nets, graphs=None, predict_class_layers: bool = True,
                 bn_track_running_stats: bool = True, keep_grads: bool = False,
                 reduce_graph: bool = False, sanity_check: bool = False,
                 return_embeddings: bool = False,
                 rng: Optional[np.random.Generator] = None):
        """Predict parameters for one target or a list of targets.

        ``keep_grads`` exists for reference API compatibility; gradients through
        prediction are available only on the JAX-native training path
        (parallel/trainer.py), not through torch targets.
        ``return_embeddings`` additionally returns the post-propagation node
        embeddings per graph (reference nn.py:189, property-prediction use).
        """
        is_lst = isinstance(nets, (list, tuple))
        nets_list = list(nets) if is_lst else [nets]

        if graphs is None:
            graph_list = self.build_graphs(nets_list)
        elif isinstance(graphs, GraphBatch):
            graph_list = list(graphs.graphs)
        elif isinstance(graphs, GraphDef):
            graph_list = [graphs]
        else:
            graph_list = list(graphs)

        batch = graphs if isinstance(graphs, GraphBatch) else GraphBatch.from_graphs(graph_list)
        assert len(batch) == len(nets_list), \
            f'{len(nets_list)} targets but {len(batch)} graphs'
        tables = [_target_table(net) for net in nets_list]
        # torch targets need host tensors; pure-functional targets keep them on device
        to_host = any(hasattr(net, 'named_modules') for net in nets_list)
        from .predict import build_plan, forward_embeddings, run_plan
        plan = build_plan(batch, tables, self.config, reduce_graph=reduce_graph,
                          sanity_check=sanity_check)
        x_flat = forward_embeddings(self.params, self.config, batch, plan.shape_ind)
        run_plan(self.params, self.config, x_flat, plan,
                 predict_class_layers=predict_class_layers, rng=rng, to_host=to_host)

        if not bn_track_running_stats:
            from .torch_interop import set_bn_eval_without_stats
            for net in nets_list:
                if hasattr(net, 'named_modules'):
                    set_bn_eval_without_stats(net)

        out = nets_list if is_lst else nets_list[0]
        if return_embeddings:
            x = np.asarray(x_flat).reshape(len(batch), batch.n_pad, -1)
            embeddings = [x[b, :g.n_nodes] for b, g in enumerate(batch.graphs)]
            return out, (embeddings if is_lst else embeddings[0])
        return out
