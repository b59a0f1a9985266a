"""Predefined baseline genotype networks (the `predefined` eval split —
reference eval_ghn.py --split predefined, backed by ppuda's code-defined nets).

Each entry is (genotype, net_args); graphs come from the torch twin through the
golden-tested tracer, execution from the functional Network.
"""

from __future__ import annotations

from ..graph.genotypes import DARTS, VIT


def predefined_nets(is_imagenet_input: bool = False):
    """{name: (genotype, net_args)} for the baseline architectures."""
    base = dict(norm='bn-track', preproc=True, C_mult=2, stem_pool=False,
                fc_layers=0, fc_dim=0, glob_avg=True, ks=3,
                imagenet_stride=4)
    vit_base = dict(norm='ln', preproc=False, C_mult=1, stem_pool=False,
                    fc_layers=0, fc_dim=0, glob_avg=True, ks=3,
                    imagenet_stride=4)
    if is_imagenet_input:
        return {
            'DARTS': (DARTS, dict(base, C=48, n_cells=14, stem_type=1)),
            'ViT': (VIT, dict(vit_base, C=128, n_cells=12, stem_type=0)),
        }
    return {
        'DARTS': (DARTS, dict(base, C=36, n_cells=8, stem_type=0)),
        'ViT': (VIT, dict(vit_base, C=128, n_cells=12, stem_type=0)),
    }


def build_predefined(name: str, num_classes: int = 10, is_imagenet_input: bool = False):
    """(graph_builder, functional_net) pair for one predefined architecture."""
    from ..graph.torch_trace import trace_torch_model
    from .darts import Network
    from .torch_darts import build_torch_network

    genotype, args = predefined_nets(is_imagenet_input)[name]
    twin = build_torch_network(genotype, num_classes=num_classes,
                               is_imagenet_input=is_imagenet_input, **args)
    fnet = Network(genotype=genotype, num_classes=num_classes,
                   is_imagenet_input=is_imagenet_input, auxiliary=False, **args)
    return (lambda ve_cutoff=50: trace_torch_model(twin, ve_cutoff=ve_cutoff)), fnet
