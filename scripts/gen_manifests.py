"""Generate torchvision state_dict manifests (ordered name+shape lists)
for tests/manifests/*.json.

Two modes:
  --from-torchvision M ...   dump the REAL torchvision state_dict order
                             (requires torchvision; run where installed)
  --builtin M ...            emit a manifest transcribed from the
                             published torchvision architecture (no
                             torchvision needed; this is an independent
                             encoding of the serialization order, NOT
                             derived from this repo's model classes or
                             test twins — hardening against twin drift,
                             VERDICT.md r1 #7)

Format: {"source": ..., "model": ..., "entries": [[name, [dims...]], ...]}
Entries include num_batches_tracked (the comparison strips it, matching
the importer).
"""
import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "manifests")


def conv(name, o, i, k, bias=True):
    e = [[f"{name}.weight", [o, i, k, k]]]
    if bias:
        e.append([f"{name}.bias", [o]])
    return e


def bn(name, c):
    return [
        [f"{name}.weight", [c]],
        [f"{name}.bias", [c]],
        [f"{name}.running_mean", [c]],
        [f"{name}.running_var", [c]],
        [f"{name}.num_batches_tracked", []],
    ]


def linear(name, o, i, bias=True):
    e = [[f"{name}.weight", [o, i]]]
    if bias:
        e.append([f"{name}.bias", [o]])
    return e


def alexnet():
    e = []
    for idx, (o, i, k) in zip((0, 3, 6, 8, 10), ((64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3))):
        e += conv(f"features.{idx}", o, i, k)
    e += linear("classifier.1", 4096, 9216)
    e += linear("classifier.4", 4096, 4096)
    e += linear("classifier.6", 1000, 4096)
    return e


def vgg11():
    e = []
    cfg = ((0, 64, 3), (3, 128, 64), (6, 256, 128), (8, 256, 256), (11, 512, 256), (13, 512, 512), (16, 512, 512), (18, 512, 512))
    for idx, o, i in cfg:
        e += conv(f"features.{idx}", o, i, 3)
    e += linear("classifier.0", 4096, 25088)
    e += linear("classifier.3", 4096, 4096)
    e += linear("classifier.6", 1000, 4096)
    return e


def vgg11_bn():
    e = []
    # conv at idx, bn at idx+1; layer indices with BN interleaved
    cfg = ((0, 64, 3), (4, 128, 64), (8, 256, 128), (11, 256, 256), (15, 512, 256), (18, 512, 512), (22, 512, 512), (25, 512, 512))
    for idx, o, i in cfg:
        e += conv(f"features.{idx}", o, i, 3)
        e += bn(f"features.{idx + 1}", o)
    e += linear("classifier.0", 4096, 25088)
    e += linear("classifier.3", 4096, 4096)
    e += linear("classifier.6", 1000, 4096)
    return e


def _basic_block(name, i, o, downsample):
    e = conv(f"{name}.conv1", o, i, 3, bias=False) + bn(f"{name}.bn1", o)
    e += conv(f"{name}.conv2", o, o, 3, bias=False) + bn(f"{name}.bn2", o)
    if downsample:
        e += conv(f"{name}.downsample.0", o, i, 1, bias=False) + bn(f"{name}.downsample.1", o)
    return e


def resnet18():
    e = conv("conv1", 64, 3, 7, bias=False) + bn("bn1", 64)
    chans = (64, 128, 256, 512)
    inc = 64
    for li, c in enumerate(chans, start=1):
        for b in range(2):
            e += _basic_block(f"layer{li}.{b}", inc if b == 0 else c, c, downsample=(b == 0 and li > 1))
            inc = c
    e += linear("fc", 1000, 512)
    return e


def _bottleneck(name, i, width, out, downsample):
    e = conv(f"{name}.conv1", width, i, 1, bias=False) + bn(f"{name}.bn1", width)
    e += conv(f"{name}.conv2", width, width, 3, bias=False) + bn(f"{name}.bn2", width)
    e += conv(f"{name}.conv3", out, width, 1, bias=False) + bn(f"{name}.bn3", out)
    if downsample:
        e += conv(f"{name}.downsample.0", out, i, 1, bias=False) + bn(f"{name}.downsample.1", out)
    return e


def resnet50():
    e = conv("conv1", 64, 3, 7, bias=False) + bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    inc = 64
    for li, (n, w) in enumerate(zip(blocks, widths), start=1):
        out = w * 4
        for b in range(n):
            e += _bottleneck(f"layer{li}.{b}", inc if b == 0 else out, w, out, downsample=(b == 0))
            inc = out
    e += linear("fc", 1000, 2048)
    return e


def _fire(name, i, s, e1, e3):
    e = conv(f"{name}.squeeze", s, i, 1)
    e += conv(f"{name}.expand1x1", e1, s, 1)
    e += conv(f"{name}.expand3x3", e3, s, 3)
    return e


def squeezenet1_0():
    e = conv("features.0", 96, 3, 7)
    fires = (
        (3, 96, 16, 64, 64), (4, 128, 16, 64, 64), (5, 128, 32, 128, 128),
        (7, 256, 32, 128, 128), (8, 256, 48, 192, 192), (9, 384, 48, 192, 192),
        (10, 384, 64, 256, 256), (12, 512, 64, 256, 256),
    )
    for idx, i, s, e1, e3 in fires:
        e += _fire(f"features.{idx}", i, s, e1, e3)
    e += conv("classifier.1", 1000, 512, 1)
    return e


def squeezenet1_1():
    e = conv("features.0", 64, 3, 3)
    fires = (
        (3, 64, 16, 64, 64), (4, 128, 16, 64, 64),
        (6, 128, 32, 128, 128), (7, 256, 32, 128, 128),
        (9, 256, 48, 192, 192), (10, 384, 48, 192, 192),
        (11, 384, 64, 256, 256), (12, 512, 64, 256, 256),
    )
    for idx, i, s, e1, e3 in fires:
        e += _fire(f"features.{idx}", i, s, e1, e3)
    e += conv("classifier.1", 1000, 512, 1)
    return e


BUILTIN = {
    "alexnet": alexnet,
    "vgg11": vgg11,
    "vgg11_bn": vgg11_bn,
    "resnet18": resnet18,
    "resnet50": resnet50,
    "squeezenet1_0": squeezenet1_0,
    "squeezenet1_1": squeezenet1_1,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-torchvision", nargs="*", default=None)
    ap.add_argument("--builtin", nargs="*", default=None)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    if args.builtin is not None:
        names = args.builtin or sorted(BUILTIN)
        for name in names:
            entries = BUILTIN[name]()
            path = os.path.join(OUT, f"{name}.json")
            with open(path, "w") as f:
                json.dump({"source": "transcribed", "model": name, "entries": entries}, f, indent=1)
            print(f"wrote {path} ({len(entries)} entries)")

    if args.from_torchvision is not None:
        import torchvision.models as tvm

        for name in args.from_torchvision:
            net = getattr(tvm, name)()
            entries = [[k, list(v.shape)] for k, v in net.state_dict().items()]
            path = os.path.join(OUT, f"{name}.json")
            with open(path, "w") as f:
                json.dump({"source": "torchvision", "model": name, "entries": entries}, f, indent=1)
            print(f"wrote {path} ({len(entries)} entries)")


if __name__ == "__main__":
    main()
