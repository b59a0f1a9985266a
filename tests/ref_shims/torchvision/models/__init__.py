import torch.nn as nn


class _Never(nn.Module):
    """Dummy class: no user model is an instance of it."""
    pass


class Inception3(_Never):
    pass


class SwinTransformer(_Never):
    pass


class VisionTransformer(_Never):
    pass


class SqueezeNet(_Never):
    pass


class _SubMod:
    pass


class vision_transformer:
    class Encoder(_Never):
        pass


class convnext:
    class LayerNorm2d(nn.LayerNorm):
        """Channel-wise LN over NCHW maps (torchvision.models.convnext semantics)."""

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = super().forward(x)
            return x.permute(0, 3, 1, 2)
