"""Torch twins for the mobile/efficient families (see torch_refs.py)."""
import math

import torch
import torch.nn as tnn
import torch.nn.functional as F


def make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def cna(cin, cout, k=3, stride=1, groups=1, dilation=1, norm=tnn.BatchNorm2d, act=tnn.ReLU6):
    pad = (k - 1) // 2 * dilation
    layers = [tnn.Conv2d(cin, cout, k, stride, pad, dilation=dilation, groups=groups, bias=norm is None)]
    if norm is not None:
        layers.append(norm(cout))
    if act is not None:
        layers.append(act(inplace=True) if act in (tnn.ReLU, tnn.ReLU6, tnn.Hardswish, tnn.SiLU) else act())
    return tnn.Sequential(*layers)


class TorchSE(tnn.Module):
    def __init__(self, cin, squeeze, act=tnn.ReLU, scale_act=tnn.Sigmoid):
        super().__init__()
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc1 = tnn.Conv2d(cin, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, cin, 1)
        self.activation = act()
        self.scale_activation = scale_act()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.scale_activation(self.fc2(self.activation(self.fc1(s))))
        return x * s


class TorchMBV2Block(tnn.Module):
    def __init__(self, inp, oup, stride, t):
        super().__init__()
        hidden = int(round(inp * t))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if t != 1:
            layers.append(cna(inp, hidden, 1))
        layers += [
            cna(hidden, hidden, 3, stride, groups=hidden),
            tnn.Conv2d(hidden, oup, 1, bias=False),
            tnn.BatchNorm2d(oup),
        ]
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TorchMobileNetV2(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        cfg = [[1, 16, 1, 1], [6, 24, 2, 2], [6, 32, 3, 2], [6, 64, 4, 2], [6, 96, 3, 1], [6, 160, 3, 2], [6, 320, 1, 1]]
        feats = [cna(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in cfg:
            for i in range(n):
                feats.append(TorchMBV2Block(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(cna(cin, 1280, 1))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2), tnn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


class TorchMBV3Block(tnn.Module):
    def __init__(self, cin, k, exp, cout, use_se, use_hs, stride, dilation, norm):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        act = tnn.Hardswish if use_hs else tnn.ReLU
        layers = []
        if exp != cin:
            layers.append(cna(cin, exp, 1, norm=norm, act=act))
        s = 1 if dilation > 1 else stride
        layers.append(cna(exp, exp, k, s, groups=exp, dilation=dilation, norm=norm, act=act))
        if use_se:
            layers.append(TorchSE(exp, make_divisible(exp // 4), scale_act=tnn.Hardsigmoid))
        layers.append(cna(exp, cout, 1, norm=norm, act=None))
        self.block = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


_MB3_LARGE = [
    (16, 3, 16, 16, False, False, 1, 1), (16, 3, 64, 24, False, False, 2, 1), (24, 3, 72, 24, False, False, 1, 1),
    (24, 5, 72, 40, True, False, 2, 1), (40, 5, 120, 40, True, False, 1, 1), (40, 5, 120, 40, True, False, 1, 1),
    (40, 3, 240, 80, False, True, 2, 1), (80, 3, 200, 80, False, True, 1, 1), (80, 3, 184, 80, False, True, 1, 1),
    (80, 3, 184, 80, False, True, 1, 1), (80, 3, 480, 112, True, True, 1, 1), (112, 3, 672, 112, True, True, 1, 1),
    (112, 5, 672, 160, True, True, 2, 1), (160, 5, 960, 160, True, True, 1, 1), (160, 5, 960, 160, True, True, 1, 1),
]
_MB3_SMALL = [
    (16, 3, 16, 16, True, False, 2, 1), (16, 3, 72, 24, False, False, 2, 1), (24, 3, 88, 24, False, False, 1, 1),
    (24, 5, 96, 40, True, True, 2, 1), (40, 5, 240, 40, True, True, 1, 1), (40, 5, 240, 40, True, True, 1, 1),
    (40, 5, 120, 48, True, True, 1, 1), (48, 5, 144, 48, True, True, 1, 1), (48, 5, 288, 96, True, True, 2, 1),
    (96, 5, 576, 96, True, True, 1, 1), (96, 5, 576, 96, True, True, 1, 1),
]


class TorchMobileNetV3(tnn.Module):
    def __init__(self, arch="large", num_classes=1000, dilated=False):
        super().__init__()
        norm = lambda c: tnn.BatchNorm2d(c, eps=1e-3, momentum=0.01)  # noqa: E731
        cfg = [list(c) for c in (_MB3_LARGE if arch == "large" else _MB3_SMALL)]
        if dilated:  # last stage uses dilation 2 (stride forced to 1)
            n_tail = 3
            for c in cfg[-n_tail:]:
                c[7] = 2
        cfg = [tuple(c) for c in cfg]
        last_channel = 1280 if arch == "large" else 1024
        feats = [cna(3, cfg[0][0], 3, 2, norm=norm, act=tnn.Hardswish)]
        for c in cfg:
            feats.append(TorchMBV3Block(*c, norm=norm))
        lastconv_in = cfg[-1][3]
        lastconv_out = 6 * lastconv_in
        feats.append(cna(lastconv_in, lastconv_out, 1, norm=norm, act=tnn.Hardswish))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(
            tnn.Linear(lastconv_out, last_channel), tnn.Hardswish(True), tnn.Dropout(0.2),
            tnn.Linear(last_channel, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(F.adaptive_avg_pool2d(x, 1), 1)
        return self.classifier(x)


class TorchMBConv(tnn.Module):
    def __init__(self, expand, k, stride, cin, cout, norm):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        exp = make_divisible(cin * expand)
        layers = []
        if exp != cin:
            layers.append(cna(cin, exp, 1, norm=norm, act=tnn.SiLU))
        layers.append(cna(exp, exp, k, stride, groups=exp, norm=norm, act=tnn.SiLU))
        layers.append(TorchSE(cin=exp, squeeze=max(1, cin // 4), act=tnn.SiLU))
        layers.append(cna(exp, cout, 1, norm=norm, act=None))
        self.block = tnn.Sequential(*layers)

    def forward(self, x):
        # stochastic depth is identity in eval mode
        return x + self.block(x) if self.use_res else self.block(x)


class TorchFusedMBConv(tnn.Module):
    def __init__(self, expand, k, stride, cin, cout, norm):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        exp = make_divisible(cin * expand)
        layers = []
        if exp != cin:
            layers.append(cna(cin, exp, k, stride, norm=norm, act=tnn.SiLU))
            layers.append(cna(exp, cout, 1, norm=norm, act=None))
        else:
            layers.append(cna(cin, cout, k, stride, norm=norm, act=tnn.SiLU))
        self.block = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class TorchEfficientNet(tnn.Module):
    def __init__(self, arch="b0", num_classes=1000):
        super().__init__()
        if arch == "b0":
            norm = tnn.BatchNorm2d
            cfg = [
                ("mb", 1, 3, 1, 32, 16, 1), ("mb", 6, 3, 2, 16, 24, 2), ("mb", 6, 5, 2, 24, 40, 2),
                ("mb", 6, 3, 2, 40, 80, 3), ("mb", 6, 5, 1, 80, 112, 3), ("mb", 6, 5, 2, 112, 192, 4),
                ("mb", 6, 3, 1, 192, 320, 1),
            ]
            last_channel = 4 * 320
        elif arch == "v2_s":
            norm = lambda c: tnn.BatchNorm2d(c, eps=1e-3)  # noqa: E731
            cfg = [
                ("fused", 1, 3, 1, 24, 24, 2), ("fused", 4, 3, 2, 24, 48, 4), ("fused", 4, 3, 2, 48, 64, 4),
                ("mb", 4, 3, 2, 64, 128, 6), ("mb", 6, 3, 1, 128, 160, 9), ("mb", 6, 3, 2, 160, 256, 15),
            ]
            last_channel = 1280
        elif arch == "v2_m":
            # torchvision efficientnet.py _efficientnet_conf("efficientnet_v2_m")
            norm = lambda c: tnn.BatchNorm2d(c, eps=1e-3)  # noqa: E731
            cfg = [
                ("fused", 1, 3, 1, 24, 24, 3), ("fused", 4, 3, 2, 24, 48, 5), ("fused", 4, 3, 2, 48, 80, 5),
                ("mb", 4, 3, 2, 80, 160, 7), ("mb", 6, 3, 1, 160, 176, 14), ("mb", 6, 3, 2, 176, 304, 18),
                ("mb", 6, 3, 1, 304, 512, 5),
            ]
            last_channel = 1280
        elif arch == "v2_l":
            norm = lambda c: tnn.BatchNorm2d(c, eps=1e-3)  # noqa: E731
            cfg = [
                ("fused", 1, 3, 1, 32, 32, 4), ("fused", 4, 3, 2, 32, 64, 7), ("fused", 4, 3, 2, 64, 96, 7),
                ("mb", 4, 3, 2, 96, 192, 10), ("mb", 6, 3, 1, 192, 224, 19), ("mb", 6, 3, 2, 224, 384, 25),
                ("mb", 6, 3, 1, 384, 640, 7),
            ]
            last_channel = 1280
        feats = [cna(3, cfg[0][4], 3, 2, norm=norm, act=tnn.SiLU)]
        for kind, expand, k, stride, cin, cout, n in cfg:
            stage = []
            for i in range(n):
                block = TorchMBConv if kind == "mb" else TorchFusedMBConv
                stage.append(block(expand, k, stride if i == 0 else 1, cin if i == 0 else cout, cout, norm))
            feats.append(tnn.Sequential(*stage))
        feats.append(cna(cfg[-1][5], last_channel, 1, norm=norm, act=tnn.SiLU))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2), tnn.Linear(last_channel, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(F.adaptive_avg_pool2d(x, 1), 1)
        return self.classifier(x)


class TorchBottleneckTransform(tnn.Module):
    def __init__(self, w_in, w_out, stride, group_width, bm, se_ratio):
        super().__init__()
        w_b = int(round(w_out * bm))
        g = w_b // group_width
        self.a = cna(w_in, w_b, 1, norm=tnn.BatchNorm2d, act=tnn.ReLU)
        self.b = cna(w_b, w_b, 3, stride, groups=g, norm=tnn.BatchNorm2d, act=tnn.ReLU)
        if se_ratio:
            self.se = TorchSE(w_b, int(round(se_ratio * w_in)))
        self.c = cna(w_b, w_out, 1, norm=tnn.BatchNorm2d, act=None)

    def forward(self, x):
        x = self.b(self.a(x))
        if hasattr(self, "se"):
            x = self.se(x)
        return self.c(x)


class TorchResBottleneckBlock(tnn.Module):
    def __init__(self, w_in, w_out, stride, group_width, bm, se_ratio):
        super().__init__()
        if w_in != w_out or stride != 1:
            self.proj = cna(w_in, w_out, 1, stride, norm=tnn.BatchNorm2d, act=None)
        else:
            self.proj = None
        self.f = TorchBottleneckTransform(w_in, w_out, stride, group_width, bm, se_ratio)

    def forward(self, x):
        px = self.proj(x) if self.proj is not None else x
        return F.relu(px + self.f(x))


class TorchRegNet(tnn.Module):
    def __init__(self, widths, depths, group_widths, se_ratio, num_classes=1000):
        super().__init__()
        self.stem = cna(3, 32, 3, 2, norm=tnn.BatchNorm2d, act=tnn.ReLU)
        stages = []
        cin = 32
        for w, d, g in zip(widths, depths, group_widths):
            blocks = []
            for i in range(d):
                blocks.append(TorchResBottleneckBlock(cin if i == 0 else w, w, 2 if i == 0 else 1, g, 1.0, se_ratio))
            stages.append(tnn.Sequential(*blocks))
            cin = w
        self.trunk_output = tnn.Sequential(*stages)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.trunk_output(self.stem(x))
        x = x.mean([2, 3])
        return self.fc(x)
