import torch.nn as nn


class _Never(nn.Module):
    """Dummy class: no user model is an instance of it."""
    pass


class Inception3(_Never):
    pass


class SwinTransformer(_Never):
    pass


# The ViT classes are ghn3_tpu's torchvision-exact twins: the reference's
# MODULES table keys on the exact Encoder type (graph.py:1129) and its ViT
# fixes are isinstance-gated (graph.py:626-634, nn.py:521-522), so the shim
# must expose the very classes the traced models are built from.
from ghn3_tpu.zoo.torch_zoo import vit_classes as _vit_classes

VisionTransformer, _ViTEncoder = _vit_classes()


class SqueezeNet(_Never):
    pass


class _SubMod:
    pass


class vision_transformer:
    Encoder = _ViTEncoder


class convnext:
    class LayerNorm2d(nn.LayerNorm):
        """Channel-wise LN over NCHW maps (torchvision.models.convnext semantics)."""

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = super().forward(x)
            return x.permute(0, 3, 1, 2)
