"""LN-affine folding A/B on ViT-B/16 b256 (VERDICT r4 #5).

ops/fold_ln.py folds every pre-norm LN scale/shift into the adjacent
qkv/fc1/head weights (exact algebra, like ops/fold_bn.py), leaving the
LN kernel affine-free (weight=None skips the scale/shift VPU ops and
gamma/beta loads, ops/layernorm.py:_ln_kernel). The r4 marginal put
total ViT LN cost at 3.8 ms/batch; this measures how much of that is
the affine (hypothesis: little — LN is HBM-bound, the affine rides the
normalize pass) with an in-process A/B, the only timing mode trusted
for ~ms effects (CLAUDE.md r3: cross-process deltas are ±1.5% noise).

Also verifies folded-vs-unfolded logits agree on-chip before timing
(a wrong transform must never post a number).

Run: python scripts/ablate_vit9.py   (TPU; ~3 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 256
_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=15, reps=3):
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


def main():
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.core.module import _map_module_tree, replace as mod_replace
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.nn.norm import LayerNorm
    from eqxvision_tpu.ops import fold_layernorm

    def randomize_lns(m, seed):
        # fresh-init gamma=1/beta=0 makes the fold a numerical no-op and
        # the parity assert vacuous; seed non-trivial affines first
        rng = np.random.RandomState(seed)

        def fn(mod):
            if isinstance(mod, LayerNorm) and mod.weight is not None:
                return mod_replace(
                    mod,
                    weight=jnp.asarray(1 + 0.3 * rng.randn(*mod.weight.shape), mod.weight.dtype),
                    bias=jnp.asarray(0.2 * rng.randn(*mod.bias.shape), mod.bias.dtype),
                )
            return mod

        return _map_module_tree(fn, m)

    model, state = create_model("vit_base")
    model = randomize_lns(tree_inference(model, True), 21)
    folded = fold_layernorm(model)
    model_bf = cast_inexact(model, jnp.bfloat16)
    folded_bf = cast_inexact(folded, jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3) * 0.5, jnp.bfloat16)

    # --- on-chip parity first (f32, small batch) ----------------------
    # Models ride as TRACED ARGUMENTS: jit of a bound method bakes all
    # params into the HLO as constants and the tunnel's remote_compile
    # rejects the >300MB body (HTTP 413 — this script's first r5 run).
    # Parity must trace under matmul precision 'float32': TPU DEFAULT
    # precision rounds f32 matmul operands through bf16, and folding the
    # affine into the weights changes that rounding — the second r5 run
    # read max|dlogit| 1.55e-2 at default precision, pure rounding skew,
    # not a wrong transform (drops to <1e-3 with true-f32 passes).
    with jax.default_matmul_precision("float32"):
        pfwd = jax.jit(lambda m, xb, s: m(xb, s))
        xs = img[:8].astype(jnp.float32)
        ref, _ = pfwd(model, xs, state)
        got, _ = pfwd(folded, xs, state)
    d = float(jnp.max(jnp.abs(got - ref)))
    print(f"fold parity: max |dlogit| = {d:.3e} (f32 b8)", flush=True)
    assert d < 1e-3, "folded model diverges on-chip; not timing a wrong transform"

    def build(m):
        @jax.jit
        def fwd_m(_m, xb):
            out, _ = _m(xb, state)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        return lambda xb: fwd_m(m, xb)

    f_plain, f_fold = build(model_bf), build(folded_bf)
    for rep in range(3):
        a = timeit_ch(f_plain, img) * 1e3
        b = timeit_ch(f_fold, img) * 1e3
        print(f"vit rep{rep}: unfolded {a:7.3f} ms | folded {b:7.3f} ms | "
              f"delta {a - b:+6.3f} ms ({(a - b) / a * 100:+.2f}%)", flush=True)

    # --- ConvNeXt-T: same fold family (block/downsample/classifier LNs)
    cmodel, cstate = create_model("convnext_tiny")
    cmodel = randomize_lns(tree_inference(cmodel, True), 22)
    cfolded = fold_layernorm(cmodel)
    with jax.default_matmul_precision("float32"):
        cref, _ = pfwd(cmodel, xs, cstate)
        cgot, _ = pfwd(cfolded, xs, cstate)
    d = float(jnp.max(jnp.abs(cgot - cref)))
    print(f"convnext fold parity: max |dlogit| = {d:.3e} (f32 b8)", flush=True)
    assert d < 1e-3

    def cbuild(m):
        @jax.jit
        def fwd_m(_m, xb):
            out, _ = _m(xb, cstate)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        return lambda xb: fwd_m(m, xb)

    cimg = img[:128]
    fc_plain = cbuild(cast_inexact(cmodel, jnp.bfloat16))
    fc_fold = cbuild(cast_inexact(cfolded, jnp.bfloat16))
    for rep in range(3):
        a = timeit_ch(fc_plain, cimg) * 1e3
        b = timeit_ch(fc_fold, cimg) * 1e3
        print(f"convnext rep{rep}: unfolded {a:7.3f} ms | folded {b:7.3f} ms | "
              f"delta {a - b:+6.3f} ms ({(a - b) / a * 100:+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
