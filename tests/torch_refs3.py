"""Torch twins for transformer families (see torch_refs.py)."""
import math

import torch
import torch.nn as tnn
import torch.nn.functional as F


class TorchConvNeXtTwin(tnn.Module):
    """Structured so state_dict key ORDER matches torchvision convnext:
    per CNBlock: layer_scale, dwconv, norm, linear1, linear2."""

    def __init__(self, setting=((96, 192, 3), (192, 384, 3), (384, 768, 9), (768, None, 3)), num_classes=1000):
        super().__init__()

        class Block(tnn.Module):
            def __init__(self, dim):
                super().__init__()
                self.layer_scale = tnn.Parameter(torch.ones(dim, 1, 1) * 1e-6)
                self.dw = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True)
                self.norm = tnn.LayerNorm(dim, eps=1e-6)
                self.pw1 = tnn.Linear(dim, 4 * dim)
                self.pw2 = tnn.Linear(4 * dim, dim)

            def forward(self, x):
                y = self.dw(x).permute(0, 2, 3, 1)
                y = self.pw2(F.gelu(self.pw1(self.norm(y))))
                y = self.layer_scale.permute(1, 2, 0) * y
                return x + y.permute(0, 3, 1, 2)

        class LN2d(tnn.LayerNorm):
            def forward(self, x):
                x = x.permute(0, 2, 3, 1)
                x = super().forward(x)
                return x.permute(0, 3, 1, 2)

        feats = [tnn.Sequential(tnn.Conv2d(3, setting[0][0], 4, 4, bias=True), LN2d(setting[0][0], eps=1e-6))]
        for cin, cout, n in setting:
            feats.append(tnn.Sequential(*[Block(cin) for _ in range(n)]))
            if cout is not None:
                feats.append(tnn.Sequential(LN2d(cin, eps=1e-6), tnn.Conv2d(cin, cout, 2, 2)))
        self.features = tnn.Sequential(*feats)
        last = setting[-1][1] or setting[-1][0]
        self.classifier = tnn.Sequential(LN2d(last, eps=1e-6), tnn.Flatten(1), tnn.Linear(last, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 1)
        return self.classifier(x)


class TorchVitAttention(tnn.Module):
    def __init__(self, dim, heads, qkv_bias=True):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, L, D = x.shape
        qkv = self.qkv(x).reshape(B, L, 3, self.heads, D // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, L, D)
        return self.proj(out)


class TorchVitBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchVitAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x


class TorchViT(tnn.Module):
    """DINO-style ViT: cls_token, pos_embed, patch_embed, blocks, norm, [head]."""

    def __init__(self, img_size=224, patch=16, dim=192, depth=4, heads=3, num_classes=0):
        super().__init__()
        n_patches = (img_size // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim).normal_(std=0.02))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_patches + 1, dim).normal_(std=0.02))
        self.patch_proj = tnn.Conv2d(3, dim, patch, patch)
        self.blocks = tnn.ModuleList([TorchVitBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        if num_classes > 0:
            self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)[:, 0]
        return self.head(x) if hasattr(self, "head") else x


# ---------------------------------------------------------------- Swin twin


def t_window_attention(x, qkv_w, proj_w, rel_bias, window, heads, shift, qkv_b, proj_b, logit_scale=None):
    """Mirror of torchvision.models.swin_transformer.shifted_window_attention."""
    B, H, W, C = x.shape
    wh, ww = window
    pad_b = (wh - H % wh) % wh
    pad_r = (ww - W % ww) % ww
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _, pH, pW, _ = x.shape
    sh, sw = shift
    if wh >= pH:
        sh = 0
    if ww >= pW:
        sw = 0
    if sh or sw:
        x = torch.roll(x, (-sh, -sw), dims=(1, 2))
    nWh, nWw = pH // wh, pW // ww
    x = x.view(B, nWh, wh, nWw, ww, C).permute(0, 1, 3, 2, 4, 5).reshape(B * nWh * nWw, wh * ww, C)
    L = wh * ww
    if logit_scale is not None and qkv_b is not None:
        qkv_b = qkv_b.clone()
        qkv_b[C : 2 * C] = 0
    qkv = F.linear(x, qkv_w, qkv_b).reshape(x.size(0), L, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if logit_scale is not None:
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        attn = attn * torch.clamp(logit_scale, max=math.log(100.0)).exp()
    else:
        q = q * (C // heads) ** -0.5
        attn = q @ k.transpose(-2, -1)
    attn = attn + rel_bias
    if sh or sw:
        mask = x.new_zeros(pH, pW)
        h_sl = ((0, -wh), (-wh, -sh), (-sh, None))
        w_sl = ((0, -ww), (-ww, -sw), (-sw, None))
        cnt = 0
        for h0, h1 in h_sl:
            for w0, w1 in w_sl:
                mask[h0:h1, w0:w1] = cnt
                cnt += 1
        mask = mask.view(nWh, wh, nWw, ww).permute(0, 2, 1, 3).reshape(nWh * nWw, L)
        amask = mask.unsqueeze(1) - mask.unsqueeze(2)
        amask = amask.masked_fill(amask != 0, -100.0).masked_fill(amask == 0, 0.0)
        attn = attn.view(B, nWh * nWw, heads, L, L) + amask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, L, L)
    attn = F.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(x.size(0), L, C)
    out = F.linear(out, proj_w, proj_b)
    out = out.view(B, nWh, nWw, wh, ww, C).permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if sh or sw:
        out = torch.roll(out, (sh, sw), dims=(1, 2))
    return out[:, :H, :W, :].contiguous()


def _rel_pos_index(wh, ww):
    coords = torch.stack(torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing="ij"))
    flat = coords.flatten(1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class TorchSwinAttn(tnn.Module):
    def __init__(self, dim, window, shift, heads):
        super().__init__()
        self.window, self.shift, self.heads = window, shift, heads
        wh, ww = window
        self.relative_position_bias_table = tnn.Parameter(torch.zeros((2 * wh - 1) * (2 * ww - 1), heads).normal_(std=0.02))
        self.register_buffer("relative_position_index", _rel_pos_index(wh, ww))
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def bias(self):
        wh, ww = self.window
        L = wh * ww
        b = self.relative_position_bias_table[self.relative_position_index.view(-1)]
        return b.view(L, L, -1).permute(2, 0, 1).unsqueeze(0)

    def forward(self, x):
        return t_window_attention(
            x, self.qkv.weight, self.proj.weight, self.bias(), self.window, self.heads,
            self.shift, self.qkv.bias, self.proj.bias,
        )


class TorchSwinAttnV2(tnn.Module):
    def __init__(self, dim, window, shift, heads):
        super().__init__()
        self.window, self.shift, self.heads = window, shift, heads
        wh, ww = window
        self.logit_scale = tnn.Parameter(torch.log(10 * torch.ones(heads, 1, 1)))
        rh = torch.arange(-(wh - 1), wh, dtype=torch.float32)
        rw = torch.arange(-(ww - 1), ww, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(rh, rw, indexing="ij")).permute(1, 2, 0).unsqueeze(0)
        table[:, :, :, 0] /= wh - 1
        table[:, :, :, 1] /= ww - 1
        table *= 8
        table = torch.sign(table) * torch.log2(torch.abs(table) + 1.0) / 3.0
        self.register_buffer("relative_coords_table", table)
        self.register_buffer("relative_position_index", _rel_pos_index(wh, ww))
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.cpb_mlp = tnn.Sequential(tnn.Linear(2, 512), tnn.ReLU(True), tnn.Linear(512, heads, bias=False))

    def bias(self):
        wh, ww = self.window
        L = wh * ww
        cpb = self.cpb_mlp(self.relative_coords_table.view(-1, 2))
        b = cpb[self.relative_position_index.view(-1)]
        b = b.view(L, L, -1).permute(2, 0, 1).unsqueeze(0)
        return 16 * torch.sigmoid(b)

    def forward(self, x):
        return t_window_attention(
            x, self.qkv.weight, self.proj.weight, self.bias(), self.window, self.heads,
            self.shift, self.qkv.bias, self.proj.bias, logit_scale=self.logit_scale,
        )


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift, v2=False):
        super().__init__()
        self.v2 = v2
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = (TorchSwinAttnV2 if v2 else TorchSwinAttn)(dim, window, shift, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        if self.v2:
            x = x + self.norm1(self.attn(x))
            x = x + self.norm2(self.fc2(F.gelu(self.fc1(x))))
        else:
            x = x + self.attn(self.norm1(x))
            x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim, v2=False):
        super().__init__()
        self.v2 = v2
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(2 * dim if v2 else 4 * dim)

    def forward(self, x):
        B, H, W, C = x.shape
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1)
        if self.v2:
            return self.norm(self.reduction(x))
        return self.reduction(self.norm(x))


class TorchSwin(tnn.Module):
    def __init__(self, patch=4, dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), window=(7, 7), num_classes=1000, v2=False):
        super().__init__()

        class Stem(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(3, dim, patch, patch)
                self.norm = tnn.LayerNorm(dim)

            def forward(self, x):
                return self.norm(self.conv(x).permute(0, 2, 3, 1))

        feats = [Stem()]
        for i, d in enumerate(depths):
            stage_dim = dim * 2**i
            stage = [
                TorchSwinBlock(
                    stage_dim, heads[i], window,
                    [0 if j % 2 == 0 else w // 2 for w in window], v2=v2,
                )
                for j in range(d)
            ]
            feats.append(tnn.Sequential(*stage))
            if i < len(depths) - 1:
                feats.append(TorchPatchMerging(stage_dim, v2=v2))
        self.features = tnn.Sequential(*feats)
        nf = dim * 2 ** (len(depths) - 1)
        self.norm = tnn.LayerNorm(nf)
        self.head = tnn.Linear(nf, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = self.norm(x)
        x = x.mean([1, 2])
        return self.head(x)
