"""Shared structural configs for the full-size zoo.

Both the torch twins (`torch_zoo.py`, the graph/tracing oracle) and the
functional JAX twins (`jax_zoo.py`, the TPU eval path) consume these tables, so
the two sides cannot drift structurally. Where torchvision derives widths from
generator formulas (RegNet's quantized log-space ramp, EfficientNet's
width/depth compound scaling), we implement the same generator and pin its
output against the published stage tables in `tests/test_zoo_coverage.py`.

Reference sweep these entries feed: /root/reference/eval_ghn.py:73-91 iterates
every torchvision ImageNet classifier present in the paper's results table
(74 archs, md5-pinned in ghn3_tpu/data/ghn3_results.json).
"""
import math
from typing import List, Optional, Sequence, Tuple

__all__ = [
    'make_divisible', 'regnet_stages', 'REGNET_PARAMS', 'regnet_config',
    'EFFICIENTNET_V1_BASE', 'EFFICIENTNET_V1_MULTS', 'efficientnet_v1_config',
    'EFFNET_V2_CFGS', 'CONVNEXT_CFGS', 'SWIN_CFGS',
]


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding used across torchvision mobile/eff families: round to
    the nearest multiple of `divisor`, never dropping below 90% of `v`."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# --------------------------------------------------------------------------
# RegNet (Radosavovic et al. 2020). torchvision builds each variant from five
# generator parameters (depth, w_0, w_a, w_m, group width); the quantized
# log-space width ramp below reproduces torchvision's
# BlockParams.from_init_params exactly.
# --------------------------------------------------------------------------

def regnet_stages(depth: int, w_0: int, w_a: float, w_m: float,
                  group_width: int) -> Tuple[List[int], List[int], List[int]]:
    """Per-stage (widths, depths, group_widths) from the generator params."""
    QUANT = 8
    widths_cont = [w_0 + w_a * j for j in range(depth)]
    capacity = [round(math.log(wc / w_0) / math.log(w_m)) for wc in widths_cont]
    block_widths = [int(round(w_0 * w_m ** k / QUANT) * QUANT) for k in capacity]

    # split points: where the quantized width changes
    stage_widths: List[int] = []
    stage_depths: List[int] = []
    for w in block_widths:
        if not stage_widths or w != stage_widths[-1]:
            stage_widths.append(w)
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1

    # group-compatibility adjustment (bottleneck multiplier is 1 for all
    # released variants): clamp the group width to the stage width, then round
    # the width to a multiple of the group width
    gws = [min(group_width, w) for w in stage_widths]
    stage_widths = [make_divisible(w, g) for w, g in zip(stage_widths, gws)]
    return stage_widths, stage_depths, gws


# (depth, w_0, w_a, w_m, group_width, se) generator params per released variant
REGNET_PARAMS = {
    'regnet_x_400mf': (22, 24, 24.48, 2.54, 16, False),
    'regnet_x_800mf': (16, 56, 35.73, 2.28, 16, False),
    'regnet_x_1_6gf': (18, 80, 34.01, 2.25, 24, False),
    'regnet_x_3_2gf': (25, 88, 26.31, 2.25, 48, False),
    'regnet_x_8gf': (23, 80, 49.56, 2.88, 120, False),
    'regnet_x_16gf': (22, 216, 55.59, 2.1, 128, False),
    'regnet_x_32gf': (23, 320, 69.86, 2.0, 168, False),
    'regnet_y_400mf': (16, 48, 27.89, 2.09, 8, True),
    'regnet_y_800mf': (14, 56, 38.84, 2.4, 16, True),
    'regnet_y_1_6gf': (27, 48, 20.71, 2.65, 24, True),
    'regnet_y_3_2gf': (21, 80, 42.63, 2.66, 24, True),
    'regnet_y_8gf': (17, 192, 76.82, 2.19, 56, True),
    'regnet_y_16gf': (18, 200, 106.23, 2.48, 112, True),
    'regnet_y_32gf': (20, 232, 115.89, 2.53, 232, True),
}


def regnet_config(variant: str, w: float = 1.0):
    """Scaled (widths, depths, group_widths, se) for a variant. `w` shrinks the
    net for tests while preserving width/group divisibility; w=1 is exact."""
    depth, w0, wa, wm, gw, se = REGNET_PARAMS[variant]
    widths, depths, gws = regnet_stages(depth, w0, wa, wm, gw)
    if w != 1.0:
        gws = [max(8, int(g * w) // 8 * 8) for g in gws]
        widths = [max(g, int(wd * w) // g * g) for wd, g in zip(widths, gws)]
    return widths, depths, gws, se


# --------------------------------------------------------------------------
# EfficientNet V1 (Tan & Le 2019): compound scaling over a fixed base config.
# Rows: (expand_ratio, kernel, stride, input_channels, out_channels, layers).
# --------------------------------------------------------------------------

EFFICIENTNET_V1_BASE = [
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
]

# (width_mult, depth_mult) per variant
EFFICIENTNET_V1_MULTS = {
    'efficientnet_b0': (1.0, 1.0),
    'efficientnet_b1': (1.0, 1.1),
    'efficientnet_b2': (1.1, 1.2),
    'efficientnet_b3': (1.2, 1.4),
    'efficientnet_b4': (1.4, 1.8),
    'efficientnet_b5': (1.6, 2.2),
    'efficientnet_b6': (1.8, 2.6),
    'efficientnet_b7': (2.0, 3.1),
}


def efficientnet_v1_config(variant: str, w: float = 1.0):
    """(stem_channels, rows, head_channels); rows are the base rows with
    channels width-scaled (divisible by 8) and layer counts depth-scaled
    (ceil). The head is 4x the final stage width, as in torchvision."""
    width_mult, depth_mult = EFFICIENTNET_V1_MULTS[variant]
    width_mult *= w
    adj = lambda c: make_divisible(c * width_mult, 8)
    rows = [(t, k, s, adj(cin), adj(cout), int(math.ceil(n * depth_mult)))
            for (t, k, s, cin, cout, n) in EFFICIENTNET_V1_BASE]
    return adj(32), rows, 4 * rows[-1][4]


# --------------------------------------------------------------------------
# EfficientNet V2 (Tan & Le 2021). Rows:
# (block, expand, kernel, stride, input_channels, out_channels, layers)
# where block is 'fused' (FusedMBConv) or 'mb' (MBConv with SE).
# --------------------------------------------------------------------------

EFFNET_V2_CFGS = {
    'efficientnet_v2_s': dict(head=1280, rows=[
        ('fused', 1, 3, 1, 24, 24, 2),
        ('fused', 4, 3, 2, 24, 48, 4),
        ('fused', 4, 3, 2, 48, 64, 4),
        ('mb', 4, 3, 2, 64, 128, 6),
        ('mb', 6, 3, 1, 128, 160, 9),
        ('mb', 6, 3, 2, 160, 256, 15),
    ]),
    'efficientnet_v2_m': dict(head=1280, rows=[
        ('fused', 1, 3, 1, 24, 24, 3),
        ('fused', 4, 3, 2, 24, 48, 5),
        ('fused', 4, 3, 2, 48, 80, 5),
        ('mb', 4, 3, 2, 80, 160, 7),
        ('mb', 6, 3, 1, 160, 176, 14),
        ('mb', 6, 3, 2, 176, 304, 18),
        ('mb', 6, 3, 1, 304, 512, 5),
    ]),
    'efficientnet_v2_l': dict(head=1280, rows=[
        ('fused', 1, 3, 1, 32, 32, 4),
        ('fused', 4, 3, 2, 32, 64, 7),
        ('fused', 4, 3, 2, 64, 96, 7),
        ('mb', 4, 3, 2, 96, 192, 10),
        ('mb', 6, 3, 1, 192, 224, 19),
        ('mb', 6, 3, 2, 224, 384, 25),
        ('mb', 6, 3, 1, 384, 640, 7),
    ]),
}


# ConvNeXt (Liu et al. 2022): (depths, dims) per released variant
CONVNEXT_CFGS = {
    'convnext_tiny': ((3, 3, 9, 3), (96, 192, 384, 768)),
    'convnext_small': ((3, 3, 27, 3), (96, 192, 384, 768)),
    'convnext_base': ((3, 3, 27, 3), (128, 256, 512, 1024)),
    'convnext_large': ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


# Swin (Liu et al. 2021): (embed_dim, depths, heads, stochastic_depth)
SWIN_CFGS = {
    'swin_t': (96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2),
    'swin_s': (96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3),
    'swin_b': (128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5),
}
