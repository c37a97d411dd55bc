"""Torch twins for segmentation models (see torch_refs.py)."""
import torch
import torch.nn as tnn
import torch.nn.functional as F

from torch_refs import TorchResNet, TorchBottleneck
from torch_refs2 import TorchMobileNetV3


class TorchBackboneTaps(tnn.Module):
    """Runs a TorchResNet trunk, returning {aux: layer3, out: layer4}."""

    def __init__(self, resnet):
        super().__init__()
        resnet.fc = tnn.Identity()
        self.body = resnet

    def forward(self, x):
        b = self.body
        x = b.maxpool(b.relu(b.bn1(b.conv1(x))))
        x = b.layer2(b.layer1(x))
        aux = b.layer3(x)
        out = b.layer4(aux)
        return aux, out


class TorchFCNHead(tnn.Sequential):
    def __init__(self, cin, cout):
        inter = cin // 4
        super().__init__(
            tnn.Conv2d(cin, inter, 3, padding=1, bias=False), tnn.BatchNorm2d(inter),
            tnn.ReLU(), tnn.Dropout(0.1), tnn.Conv2d(inter, cout, 1),
        )


class TorchASPPPooling(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        size = x.shape[-2:]
        s = F.adaptive_avg_pool2d(x, 1)
        s = F.relu(self.bn(self.conv(s)))
        return s.expand(-1, -1, *size)


class TorchASPP(tnn.Module):
    def __init__(self, cin, rates, cout=256):
        super().__init__()
        branches = [tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout), tnn.ReLU())]
        for r in rates:
            branches.append(tnn.Sequential(tnn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False), tnn.BatchNorm2d(cout), tnn.ReLU()))
        branches.append(TorchASPPPooling(cin, cout))
        self.convs = tnn.ModuleList(branches)
        self.project = tnn.Sequential(tnn.Conv2d(5 * cout, cout, 1, bias=False), tnn.BatchNorm2d(cout), tnn.ReLU(), tnn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([b(x) for b in self.convs], 1))


class TorchDeepLabHead(tnn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(
            TorchASPP(cin, [12, 24, 36]),
            tnn.Conv2d(256, 256, 3, padding=1, bias=False), tnn.BatchNorm2d(256), tnn.ReLU(),
            tnn.Conv2d(256, cout, 1),
        )


class TorchSimpleSeg(tnn.Module):
    def __init__(self, head_cls, num_classes=21, aux=True):
        super().__init__()
        self.backbone = TorchBackboneTaps(
            TorchResNet(TorchBottleneck, [3, 4, 6, 3], replace_stride_with_dilation=[False, True, True])
        )
        self.classifier = head_cls(2048, num_classes)
        self.aux_classifier = TorchFCNHead(1024, num_classes) if aux else None

    def forward(self, x):
        size = x.shape[-2:]
        aux_feat, out_feat = self.backbone(x)
        out = F.interpolate(self.classifier(out_feat), size=size, mode="bilinear", align_corners=False)
        aux = None
        if self.aux_classifier is not None:
            aux = F.interpolate(self.aux_classifier(aux_feat), size=size, mode="bilinear", align_corners=False)
        return aux, out


class TorchLRASPP(tnn.Module):
    def __init__(self, num_classes=21):
        super().__init__()
        mb3 = TorchMobileNetV3("large", dilated=True)
        self.backbone = mb3.features

        class Head(tnn.Module):
            def __init__(self):
                super().__init__()
                self.cbr = tnn.Sequential(tnn.Conv2d(960, 128, 1, bias=False), tnn.BatchNorm2d(128), tnn.ReLU())
                self.scale = tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(960, 128, 1, bias=False), tnn.Sigmoid())
                self.low_classifier = tnn.Conv2d(40, num_classes, 1)
                self.high_classifier = tnn.Conv2d(128, num_classes, 1)

            def forward(self, low, high):
                x = self.cbr(high) * F.interpolate(self.scale(high), size=high.shape[-2:], mode="bilinear", align_corners=False)
                x = F.interpolate(x, size=low.shape[-2:], mode="bilinear", align_corners=False)
                return self.low_classifier(low) + self.high_classifier(x)

        self.classifier = Head()

    def forward(self, x):
        size = x.shape[-2:]
        feats = x
        low = high = None
        for i, layer in enumerate(self.backbone):
            feats = layer(feats)
            if i == 4:
                low = feats
            if i == 16:
                high = feats
        out = self.classifier(low, high)
        return F.interpolate(out, size=size, mode="bilinear", align_corners=False)
