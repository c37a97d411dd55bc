"""Swin-S / Swin-V2-S / Swin-V2-B kernel-gate check (VERDICT r4 #6).

The whole-block fusion gate (C<=192, ops/window_attention.py:
fused_swin_block_supported) and the softmax policy (safe prefold for
v1, per-head loop in the v2 whole-block kernel, quarter-power in the
packed kernel) were tuned on the -T variants only. The deeper models
change the mix: swin_s/swin_v2_s triple the C=384/512 stage3 depth
(where only the PACKED kernel runs), and swin_v2_b shifts every stage
up a width tier (128/256/512/1024, heads 4/8/16/32 — H=32 stage4 was
never exercised on-chip before this script).

Modes (env read at trace time; one process A/Bs all):
  default     all kernels on, softmax=safe (the shipping config)
  noblock     EQXVISION_TPU_SWIN_FUSED_BLOCK=0 (packed attn + XLA MLP)
  nopacked    EQXVISION_TPU_SWIN_PACKED=0 (pure-XLA attention)
  unsafe      softmax=unsafe (NaN-safety cost upper bound at depth)

Also checks default-vs-nopacked logit agreement on a small batch first
(a kernel that silently diverges at an untested H/C must never post a
perf number).

Run: python scripts/ablate_swin12.py [model ...]   (TPU; ~20 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.filters import cast_inexact
from eqxvision_tpu.models import create_model

_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=10, reps=3):
    _sync(fn(x))

    def run(n):
        t0 = time.perf_counter()
        xi = x
        for _ in range(n):
            xi = fn(xi)
        _sync(xi)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters


MODES = {
    "default": {},
    "noblock": {"EQXVISION_TPU_SWIN_FUSED_BLOCK": "0"},
    "nopacked": {"EQXVISION_TPU_SWIN_PACKED": "0"},
    "unsafe": {"EQXVISION_TPU_SWIN_SOFTMAX": "unsafe"},
}
_KEYS = sorted({k for m in MODES.values() for k in m})


def _set_mode(mode):
    for k in _KEYS:
        os.environ.pop(k, None)
    os.environ.update(MODES[mode])


def bench_model(name, batch, size):
    model, state = create_model(name)
    model = tree_inference(model, True)
    model_bf = cast_inexact(model, jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, size, size, 3) * 0.5, jnp.bfloat16)

    # parity first: kernels (default) vs pure XLA on a small f32 batch.
    # The model rides as a TRACED ARGUMENT (not a closure): jit of a
    # bound method bakes every param into the HLO as constants, and the
    # tunnel's remote_compile rejects >~100MB request bodies (HTTP 413,
    # seen on vit_base f32 in this round's first vit9 run). A fresh
    # lambda per mode forces the retrace that picks up the env flags.
    xs = x[:8].astype(jnp.float32)
    _set_mode("default")
    ref, _ = jax.jit(lambda m, xb, s: m(xb, s))(model, xs, state)
    _set_mode("nopacked")
    got, _ = jax.jit(lambda m, xb, s: m(xb, s))(model, xs, state)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"{name}: kernel-vs-XLA parity max|dlogit| = {d:.3e} (f32 b8)", flush=True)
    assert d < 5e-2, f"{name}: kernel path diverges at this H/C; not timing it"

    results = {}
    for mode in MODES:
        _set_mode(mode)

        @jax.jit
        def fwd_m(_m, xb, _s):
            out, _ = _m(xb, _s)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        fwd = lambda xb, _f=fwd_m: _f(model_bf, xb, state)  # noqa: E731
        t = timeit_ch(fwd, x)
        results[mode] = t
        print(
            f"{name} b{batch} {mode:9s}: {t*1e3:7.2f} ms  {batch/t:7.1f} img/s",
            flush=True,
        )
    _set_mode("default")
    base = results["default"]
    for mode, t in results.items():
        if mode != "default":
            print(f"  {name}: default vs {mode}: {(t/base - 1)*100:+.1f}% time", flush=True)


def main():
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    configs = [("swin_s", 128, 224), ("swin_v2_s", 128, 256), ("swin_v2_b", 64, 256)]
    for name, batch, size in configs:
        if wanted and name not in wanted:
            continue
        bench_model(name, batch, size)


if __name__ == "__main__":
    main()
