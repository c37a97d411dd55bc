"""Minimal PyTorch twin architectures for end-to-end parity testing.

torchvision is not installed in this environment and checkpoints can't
be downloaded (zero egress), so golden parity is established against
these architecture twins written with plain ``torch.nn``: build the twin
with its default random init, export its ``state_dict()``, import that
into the eqxvision_tpu model, and compare logits. This exercises the
exact code path torchvision checkpoints take (same tensor names, shapes
and ordering conventions as torchvision's implementations).
"""
import torch
import torch.nn as tnn


class TorchAlexNet(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(True),
            tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(True),
            tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(True), tnn.MaxPool2d(3, 2),
        )
        self.avgpool = tnn.AdaptiveAvgPool2d((6, 6))
        self.classifier = tnn.Sequential(
            tnn.Dropout(), tnn.Linear(256 * 36, 4096), tnn.ReLU(True),
            tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(True),
            tnn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.classifier(x)


class TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64, dilation=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64, dilation=1):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, dilation, groups=groups, dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet(tnn.Module):
    def __init__(self, block, layers, num_classes=1000, groups=1, width_per_group=64, replace_stride_with_dilation=None):
        super().__init__()
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.inplanes, self.dilation = 64, 1
        self.groups, self.base_width = groups, width_per_group
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2, replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, 256, layers[2], 2, replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, 512, layers[3], 2, replace_stride_with_dilation[2])
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
        downsample, previous_dilation = None, self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample, self.groups, self.base_width, previous_dilation)]
        self.inplanes = planes * block.expansion
        layers += [
            block(self.inplanes, planes, groups=self.groups, base_width=self.base_width, dilation=self.dilation)
            for _ in range(1, blocks)
        ]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def torch_resnet18(**kw):
    return TorchResNet(TorchBasicBlock, [2, 2, 2, 2], **kw)


def torch_resnet50(**kw):
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3], **kw)


def torch_resnext50_32x4d(**kw):
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3], groups=32, width_per_group=4, **kw)


def torch_vgg(cfg="A", batch_norm=False, num_classes=1000):
    cfgs = {
        "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
        "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
        "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
        "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
    }
    layers, in_ch = [], 3
    for v in cfgs[cfg]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            if batch_norm:
                layers.append(tnn.BatchNorm2d(v))
            layers.append(tnn.ReLU(True))
            in_ch = v

    class TorchVGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 49, 4096), tnn.ReLU(True), tnn.Dropout(),
                tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
                tnn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = torch.flatten(self.avgpool(self.features(x)), 1)
            return self.classifier(x)

    return TorchVGG()


class TorchFire(tnn.Module):
    def __init__(self, inp, sq, e1, e3):
        super().__init__()
        self.squeeze = tnn.Conv2d(inp, sq, 1)
        self.squeeze_activation = tnn.ReLU(True)
        self.expand1x1 = tnn.Conv2d(sq, e1, 1)
        self.expand1x1_activation = tnn.ReLU(True)
        self.expand3x3 = tnn.Conv2d(sq, e3, 3, padding=1)
        self.expand3x3_activation = tnn.ReLU(True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat(
            [self.expand1x1_activation(self.expand1x1(x)), self.expand3x3_activation(self.expand3x3(x))], 1
        )


class TorchSqueezeNet(tnn.Module):
    def __init__(self, version="1_0", num_classes=1000):
        super().__init__()
        if version == "1_0":
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 96, 7, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2, ceil_mode=True),
                TorchFire(96, 16, 64, 64), TorchFire(128, 16, 64, 64), TorchFire(128, 32, 128, 128),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                TorchFire(256, 32, 128, 128), TorchFire(256, 48, 192, 192),
                TorchFire(384, 48, 192, 192), TorchFire(384, 64, 256, 256),
                tnn.MaxPool2d(3, 2, ceil_mode=True), TorchFire(512, 64, 256, 256),
            )
        else:
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(True), tnn.MaxPool2d(3, 2, ceil_mode=True),
                TorchFire(64, 16, 64, 64), TorchFire(128, 16, 64, 64),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                TorchFire(128, 32, 128, 128), TorchFire(256, 32, 128, 128),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                TorchFire(256, 48, 192, 192), TorchFire(384, 48, 192, 192),
                TorchFire(384, 64, 256, 256), TorchFire(512, 64, 256, 256),
            )
        self.classifier = tnn.Sequential(
            tnn.Dropout(0.5), tnn.Conv2d(512, num_classes, 1), tnn.ReLU(True), tnn.AdaptiveAvgPool2d((1, 1))
        )

    def forward(self, x):
        return torch.flatten(self.classifier(self.features(x)), 1)


class TorchDenseLayer(tnn.Module):
    def __init__(self, nin, growth, bn_size):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(nin)
        self.relu1 = tnn.ReLU(True)
        self.conv1 = tnn.Conv2d(nin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.relu2 = tnn.ReLU(True)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        out = self.conv1(self.relu1(self.norm1(x)))
        return self.conv2(self.relu2(self.norm2(out)))


class TorchDenseBlock(tnn.Module):
    def __init__(self, n, nin, bn_size, growth):
        super().__init__()
        self.block = tnn.ModuleList([TorchDenseLayer(nin + i * growth, growth, bn_size) for i in range(n)])

    def forward(self, x):
        feats = [x]
        for layer in self.block:
            feats.append(layer(torch.cat(feats, 1)))
        return torch.cat(feats, 1)


class TorchDenseNet(tnn.Module):
    def __init__(self, growth=32, cfg=(6, 12, 24, 16), ninit=64, bn_size=4, num_classes=1000):
        super().__init__()
        feats = [
            tnn.Conv2d(3, ninit, 7, 2, 3, bias=False), tnn.BatchNorm2d(ninit), tnn.ReLU(True), tnn.MaxPool2d(3, 2, 1),
        ]
        nf = ninit
        for i, n in enumerate(cfg):
            feats.append(TorchDenseBlock(n, nf, bn_size, growth))
            nf += n * growth
            if i != len(cfg) - 1:
                feats += [tnn.BatchNorm2d(nf), tnn.ReLU(True), tnn.Conv2d(nf, nf // 2, 1, bias=False), tnn.AvgPool2d(2, 2)]
                nf //= 2
        feats.append(tnn.BatchNorm2d(nf))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Linear(nf, num_classes)

    def forward(self, x):
        import torch.nn.functional as F
        x = F.relu(self.features(x))
        x = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
        return self.classifier(x)


class TorchBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        import torch.nn.functional as F
        return F.relu(self.bn(self.conv(x)), inplace=True)


class TorchInception(tnn.Module):
    def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.branch1 = TorchBasicConv2d(cin, c1, kernel_size=1)
        self.branch2 = tnn.Sequential(TorchBasicConv2d(cin, c3r, kernel_size=1), TorchBasicConv2d(c3r, c3, kernel_size=3, padding=1))
        self.branch3 = tnn.Sequential(TorchBasicConv2d(cin, c5r, kernel_size=1), TorchBasicConv2d(c5r, c5, kernel_size=3, padding=1))
        self.branch4 = tnn.Sequential(tnn.MaxPool2d(3, 1, 1, ceil_mode=True), TorchBasicConv2d(cin, pp, kernel_size=1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)], 1)


class TorchInceptionAux(tnn.Module):
    def __init__(self, cin, num_classes):
        super().__init__()
        self.conv = TorchBasicConv2d(cin, 128, kernel_size=1)
        self.fc1 = tnn.Linear(2048, 1024)
        self.fc2 = tnn.Linear(1024, num_classes)

    def forward(self, x):
        import torch.nn.functional as F
        x = F.adaptive_avg_pool2d(x, (4, 4))
        x = torch.flatten(self.conv(x), 1)
        x = F.relu(self.fc1(x), inplace=True)
        return self.fc2(x)


class TorchGoogLeNet(tnn.Module):
    def __init__(self, num_classes=1000, aux_logits=True, transform_input=False):
        super().__init__()
        self.transform_input = transform_input
        self.conv1 = TorchBasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = TorchBasicConv2d(64, 64, kernel_size=1)
        self.conv3 = TorchBasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.inception3a = TorchInception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = TorchInception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.inception4a = TorchInception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = TorchInception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = TorchInception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = TorchInception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = TorchInception(528, 256, 160, 320, 32, 128, 128)
        self.maxpool4 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.inception5a = TorchInception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = TorchInception(832, 384, 192, 384, 48, 128, 128)
        if aux_logits:
            self.aux1 = TorchInceptionAux(512, num_classes)
            self.aux2 = TorchInceptionAux(528, num_classes)
        self.dropout = tnn.Dropout(0.2)
        self.fc = tnn.Linear(1024, num_classes)

    def forward(self, x):
        if self.transform_input:
            ch0 = torch.unsqueeze(x[:, 0], 1) * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = torch.unsqueeze(x[:, 1], 1) * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = torch.unsqueeze(x[:, 2], 1) * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([ch0, ch1, ch2], 1)
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        x = self.maxpool3(self.inception3b(self.inception3a(x)))
        x = self.inception4a(x)
        x = self.inception4e(self.inception4d(self.inception4c(self.inception4b(x))))
        x = self.maxpool4(x)
        x = self.inception5b(self.inception5a(x))
        import torch.nn.functional as F
        x = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
        return self.fc(self.dropout(x))


class TorchShuffleBlock(tnn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = tnn.Sequential(
                tnn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False), tnn.BatchNorm2d(inp),
                tnn.Conv2d(inp, bf, 1, bias=False), tnn.BatchNorm2d(bf), tnn.ReLU(True),
            )
        else:
            self.branch1 = tnn.Sequential()
        b2in = inp if stride > 1 else bf
        self.branch2 = tnn.Sequential(
            tnn.Conv2d(b2in, bf, 1, bias=False), tnn.BatchNorm2d(bf), tnn.ReLU(True),
            tnn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False), tnn.BatchNorm2d(bf),
            tnn.Conv2d(bf, bf, 1, bias=False), tnn.BatchNorm2d(bf), tnn.ReLU(True),
        )

    @staticmethod
    def _shuffle(x, groups):
        n, c, h, w = x.size()
        x = x.view(n, groups, c // groups, h, w).transpose(1, 2).contiguous()
        return x.view(n, c, h, w)

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat([x1, self.branch2(x2)], 1)
        else:
            out = torch.cat([self.branch1(x), self.branch2(x)], 1)
        return self._shuffle(out, 2)


class TorchShuffleNetV2(tnn.Module):
    def __init__(self, repeats=(4, 8, 4), channels=(24, 48, 96, 192, 1024), num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Sequential(tnn.Conv2d(3, channels[0], 3, 2, 1, bias=False), tnn.BatchNorm2d(channels[0]), tnn.ReLU(True))
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = channels[0]
        for i, (r, oup) in enumerate(zip(repeats, channels[1:4])):
            seq = [TorchShuffleBlock(inp, oup, 2)] + [TorchShuffleBlock(oup, oup, 1) for _ in range(r - 1)]
            setattr(self, f"stage{i+2}", tnn.Sequential(*seq))
            inp = oup
        self.conv5 = tnn.Sequential(tnn.Conv2d(inp, channels[4], 1, bias=False), tnn.BatchNorm2d(channels[4]), tnn.ReLU(True))
        self.fc = tnn.Linear(channels[4], num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.stage4(self.stage3(self.stage2(x)))
        x = self.conv5(x)
        x = x.mean([2, 3])
        return self.fc(x)
