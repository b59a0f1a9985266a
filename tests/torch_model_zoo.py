"""Small PyTorch target models used as tracer/predict test inputs.

These play the role of torchvision models (not installed in this environment):
they cover the op patterns the graph builder must handle — residual adds, concats,
squeeze-excite (sigmoid-mul CSE), depthwise/dilated convs, pooling, LayerNorm,
multi-head attention (softmax), positional embeddings, classifier heads.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class PlainCNN(nn.Module):
    def __init__(self, c=8, num_classes=10, depth=2):
        super().__init__()
        layers = [nn.Conv2d(3, c, 3, padding=1, bias=False), nn.BatchNorm2d(c), nn.ReLU()]
        for _ in range(depth - 1):
            layers += [nn.Conv2d(c, c, 3, padding=1, bias=False), nn.BatchNorm2d(c), nn.ReLU()]
        self.features = nn.Sequential(*layers)
        self.fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = self.features(x)
        return self.fc(x.mean(dim=(2, 3)))


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                                            nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class MiniResNet(nn.Module):
    """ResNet-style net: stem + maxpool + residual blocks + global avg + fc."""

    def __init__(self, c=8, num_classes=10, blocks=(1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, c, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        layers = []
        cin = c
        for i, n in enumerate(blocks):
            cout = c * (2 ** i)
            for j in range(n):
                layers.append(BasicBlock(cin, cout, stride=2 if (j == 0 and i > 0) else 1))
                cin = cout
        self.layers = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(cin, num_classes)
        self.expected_input_sz = 64

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layers(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class SEBlock(nn.Module):
    def __init__(self, c, r=2):
        super().__init__()
        self.fc1 = nn.Linear(c, c // r)
        self.fc2 = nn.Linear(c // r, c)

    def forward(self, x):
        s = x.mean(dim=(2, 3))
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s[:, :, None, None]


class MiniSENet(nn.Module):
    """Exercises the CSE (sigmoid-mul) detection heuristics."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, c, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.se = SEBlock(c)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.se(x)
        x = F.relu(self.bn2(self.conv2(x)))
        return self.fc(x.mean(dim=(2, 3)))


class MiniInception(nn.Module):
    """Exercises concat nodes and parallel branches."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.stem = nn.Conv2d(3, c, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(c)
        self.b1 = nn.Conv2d(c, c, 1, bias=False)
        self.b2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.b3 = nn.MaxPool2d(3, stride=1, padding=1)
        self.fc = nn.Linear(3 * c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn(self.stem(x)))
        x = torch.cat([self.b1(x), self.b2(x), self.b3(x)], dim=1)
        return self.fc(x.mean(dim=(2, 3)))


class MiniMobile(nn.Module):
    """Depthwise separable + dilated convs (sep_conv / dil_conv primitives)."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.stem = nn.Conv2d(3, c, 3, stride=2, padding=1, bias=False)
        self.bn0 = nn.BatchNorm2d(c)
        self.dw = nn.Conv2d(c, c, 3, padding=1, groups=c, bias=False)
        self.pw = nn.Conv2d(c, c, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.dil = nn.Conv2d(c, c, 3, padding=2, dilation=2, groups=c, bias=False)
        self.pw2 = nn.Conv2d(c, c, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn0(self.stem(x)))
        x = F.relu(self.bn1(self.pw(self.dw(x))))
        x = F.relu(self.bn2(self.pw2(self.dil(x))))
        return self.fc(x.mean(dim=(2, 3)))


class TinyAttention(nn.Module):
    def __init__(self, dim, heads=2):
        super().__init__()
        self.heads = heads
        self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
        self.to_out = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.to_qkv(x).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        att = att.softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, c)
        return self.to_out(out)


class PosEnc(nn.Module):
    """Learned positional encoding added to a spatial feature map."""

    def __init__(self, c, ks):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, c, ks, ks))

    def forward(self, x):
        return x + self.weight


class MiniViT(nn.Module):
    """Patch-embed stem + pos-enc + transformer blocks (msa/ln/pos_enc primitives).

    Positional encoding uses nn.Embedding (recognized as 'pos_enc' by both the
    reference MODULES table and our tracer; a custom PosEnc class is recognized
    only by our tracer — see MiniViTPosEnc)."""

    def __init__(self, dim=16, depth=1, num_classes=10):
        super().__init__()
        self.stem0 = nn.Conv2d(3, dim, 8, stride=8, bias=False)
        self.pos_enc = nn.Embedding(16, dim)
        blocks = []
        for _ in range(depth):
            blocks += [nn.LayerNorm(dim), TinyAttention(dim), nn.LayerNorm(dim)]
        self.blocks = nn.ModuleList(blocks)
        self.mlp = nn.Linear(dim, dim)
        self.head = nn.Linear(dim, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = self.stem0(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = x + self.pos_enc(torch.arange(x.shape[1], device=x.device))[None]
        i = 0
        while i < len(self.blocks):
            ln1, attn, ln2 = self.blocks[i], self.blocks[i + 1], self.blocks[i + 2]
            x = x + attn(ln1(x))
            x = x + self.mlp(ln2(x))
            i += 3
        return self.head(x.mean(1))




class SwinBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SwinAttention(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Linear(dim, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class SwinAttention(nn.Module):
    def __init__(self, dim, heads=2):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = ((q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5).softmax(dim=-1)
        return self.proj((att @ v).transpose(1, 2).reshape(b, n, c))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(2 * dim)
        self.reduction = nn.Linear(2 * dim, 2 * dim, bias=False)

    def forward(self, x):
        b, n, c = x.shape
        x = x.reshape(b, n // 2, 2 * c)
        return self.reduction(self.norm(x))


try:  # subclass torchvision's class so isinstance-gated reference fixes engage
    from torchvision.models import SwinTransformer as _SwinBase
except ImportError:  # pragma: no cover
    _SwinBase = nn.Module


class SwinTransformer(_SwinBase):
    """Mini hierarchical transformer; the class (name) triggers the reference's
    Swin-specific edge fixes (graph.py:579-598), which our tracer replicates."""

    def __init__(self, dim=8, num_classes=10):
        super().__init__()
        self.stem0 = nn.Conv2d(3, dim, 8, stride=8, bias=False)
        self.stage1 = SwinBlock(dim)
        self.merge1 = PatchMerging(dim)
        self.stage2 = SwinBlock(2 * dim)
        self.norm = nn.LayerNorm(2 * dim)
        self.head = nn.Linear(2 * dim, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = self.stem0(x).flatten(2).transpose(1, 2)
        x = self.stage1(x)
        x = self.merge1(x)
        x = self.stage2(x)
        return self.head(self.norm(x).mean(1))



class MiniMHANet(nn.Module):
    """Uses torch nn.MultiheadAttention: exercises the in_proj_weight/in_proj_bias
    parameter path (reference MODULES + _set_params MHA handling)."""

    def __init__(self, dim=16, num_classes=10):
        super().__init__()
        self.stem0 = nn.Conv2d(3, dim, 8, stride=8, bias=False)
        self.ln1 = nn.LayerNorm(dim)
        self.mha = nn.MultiheadAttention(dim, 2, batch_first=True, bias=False)
        self.ln2 = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = self.stem0(x).flatten(2).transpose(1, 2)
        y = self.ln1(x)
        y, _ = self.mha(y, y, y, need_weights=False)
        x = x + y
        return self.head(self.ln2(x).mean(1))



class TiedWeightNet(nn.Module):
    """Two modules sharing one weight tensor (reference warns and keeps the
    first name, graph.py:930-936)."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, c, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.conv3 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.conv3.weight = self.conv2.weight  # tie
        self.bn2 = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.conv2(x))
        x = F.relu(self.bn2(self.conv3(x)))
        return self.fc(x.mean(dim=(2, 3)))


class TupleOutputNet(nn.Module):
    """Auxiliary head -> tuple output (inception-style; tracer walks every output)."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, c, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, stride=2, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes)
        self.aux_fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        aux = self.aux_fc(x.mean(dim=(2, 3)))
        x = F.relu(self.bn2(self.conv2(x)))
        return self.fc(x.mean(dim=(2, 3))), aux


class NoBiasHead(nn.Module):
    """Classifier without bias: the last-weight node is also the last node."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, c, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes, bias=False)
        self.expected_input_sz = 32

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        return self.fc(x.mean(dim=(2, 3)))



try:  # subclass torchvision's class so the reference's isinstance fix engages
    from torchvision.models import SqueezeNet as _SqueezeBase
except ImportError:  # pragma: no cover
    _SqueezeBase = nn.Module


class SqueezeNet(_SqueezeBase):
    """Mini SqueezeNet: conv-1x1 classifier followed by global pooling — the
    class (name) triggers the reference's node-reorder fix (graph.py:636-641)
    and the 2d->4d parameter delivery path."""

    def __init__(self, c=8, num_classes=10):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, c, 3, stride=2, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(c, c // 2, 1),   # squeeze
            nn.ReLU(inplace=True),
            nn.Conv2d(c // 2, c, 1),   # expand
            nn.ReLU(inplace=True))
        self.classifier = nn.Sequential(
            nn.Dropout(0.5),
            nn.Conv2d(c, num_classes, 1),
            nn.ReLU(inplace=True))
        self.expected_input_sz = 32

    def forward(self, x):
        x = self.classifier(self.features(x))
        return torch.flatten(x.mean(dim=(2, 3)), 1)


class MiniDenseNet(nn.Module):
    """Dense connectivity: every layer concatenates all previous feature maps."""

    def __init__(self, growth=4, layers=3, num_classes=10):
        super().__init__()
        self.stem = nn.Conv2d(3, growth, 3, padding=1, bias=False)
        self.bns = nn.ModuleList()
        self.convs = nn.ModuleList()
        c = growth
        for _ in range(layers):
            self.bns.append(nn.BatchNorm2d(c))
            self.convs.append(nn.Conv2d(c, growth, 3, padding=1, bias=False))
            c += growth
        self.bn_final = nn.BatchNorm2d(c)
        self.fc = nn.Linear(c, num_classes)
        self.expected_input_sz = 32

    def forward(self, x):
        feats = [self.stem(x)]
        for bn, conv in zip(self.bns, self.convs):
            x = torch.cat(feats, dim=1) if len(feats) > 1 else feats[0]
            feats.append(conv(F.relu(bn(x))))
        x = F.relu(self.bn_final(torch.cat(feats, dim=1)))
        return self.fc(x.mean(dim=(2, 3)))


ZOO = {
    'plain_cnn': lambda: PlainCNN(),
    'mini_resnet': lambda: MiniResNet(),
    'mini_senet': lambda: MiniSENet(),
    'mini_inception': lambda: MiniInception(),
    'mini_mobile': lambda: MiniMobile(),
    'mini_vit': lambda: MiniViT(),
    # torchvision-exact ViT structure: bare class_token, MultiheadAttention
    # in_proj qkv bias, Encoder.pos_embedding (reference graph.py:626-634)
    'mini_tv_vit': lambda: __import__('ghn3_tpu.zoo.torch_zoo', fromlist=['vit_b_16'])
        .vit_b_16(num_classes=10, dim=32, depth=2, heads=2, patch=8, img_size=32),
    'mini_swin': lambda: SwinTransformer(),
    'mini_mha': lambda: MiniMHANet(),
    'tied_weights': lambda: TiedWeightNet(),
    'tuple_output': lambda: TupleOutputNet(),
    'no_bias_head': lambda: NoBiasHead(),
    'mini_squeezenet': lambda: SqueezeNet(),
    'mini_densenet': lambda: MiniDenseNet(),
}
